// Measure q92b's ACTUAL recall vs the exact q92 anchor at the driver's
// correctness scale (sf0.01) and the bench scale (sf0.1) — the number the
// SimilaritySpec floor should honestly assert (VERDICT r11 #3: the 0.5
// floor is loose; a cell-join bug that quietly degrades recall would pass).
// Usage: /opt/spark/bin/spark-shell --driver-memory 48g \
//   --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/q92b_recall_probe.scala < /dev/null
val report: String = {
  def mined(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").map { dir =>
    val exact = mined(graft.operators.Similarity.q92(spark, dir))
    val ivf = mined(graft.operators.Similarity.q92b(spark, dir))
    val recall = (exact & ivf).size.toDouble / exact.size
    f"$dir: exact=${exact.size} ivf=${ivf.size} recall=$recall%.4f"
  }.mkString("\n")
}
println("Q92B_RECALL_REPORT\n" + report)
