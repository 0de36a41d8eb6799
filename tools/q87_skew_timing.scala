// q87 clean-vs-skew timing after the exact-dup rep collapse (follows the
// skew_probe_q85 harness: interleaved best-of-3 on the same session).
val q87report: String = {
  val clean = "/root/repo/target/sf1"
  val skew = "/root/repo/target/sf1skew"
  for (d <- Seq(clean, skew))
    spark.read.parquet(s"$d/documents.parquet").count()
  var bc = Double.MaxValue
  var bs = Double.MaxValue
  for (pass <- 1 to 3; d <- Seq(clean, skew)) {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q87_split_repair")(spark, d)
      .write.mode("overwrite").format("noop").save()
    val t = (System.nanoTime() - t0) / 1e9
    if (d == clean) bc = math.min(bc, t) else bs = math.min(bs, t)
  }
  f"q87_split_repair (rep-collapsed)  $bc%6.2f s  $bs%6.2f s  x${bs / bc}%.2f"
}
println(q87report)
