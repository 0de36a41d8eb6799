// Profiling probe: settle curves for the r3-regressed queries.
// Usage: spark-shell --driver-class-path target/scala-2.13/classes ... -I tools/settle_probe.scala
val sfDir = "/root/testdata/sf0.1"
val names = Seq("q24_embedding_neardup", "q26_text_quality", "q27_lang_id",
  "q28_multimodal_meta", "q19_ngram_top100", "q02_word_count", "q01_inverted_index",
  "q01b_salted_index", "q00_reference_index")
Seq("lineitem", "orders", "documents", "embeddings", "events")
  .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
for (n <- names) {
  val fn = graft.SparkEntry.queries(n)
  val times = (1 to 8).map { _ =>
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"PROBE $n%-24s " + times.map(t => f"$t%.2f").mkString(" "))
}
println("PROBE_DONE")
System.exit(0)
