// q92 anchor vs q92b IVF twin, sf0.1 -> sf1 scaling on the SAME session
// (the q82-x11.6-vs-q25-x1.1 analogue): the exact anchor's scored-pair
// mass is probes x corpus = N^2/40, so its ratio must grow ~x100 headroom
// superlinearly at 10x data while the IVF twin — probes x cell-mates with
// ~sqrt(n) cells — stays near-linear.
// Usage: /opt/spark/bin/spark-shell --driver-memory 48g \
//   --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/q92_twin_timing.scala < /dev/null
val report: String = {
  val small = "/root/testdata/sf0.1"
  val big = "/root/repo/target/sf1"
  for (d <- Seq(small, big))
    spark.read.parquet(s"$d/embeddings.parquet").count()
  val names = Seq("q92_hard_negatives", "q92b_hard_negatives_ivf")
  val best = scala.collection.mutable.Map[(String, String), Double]()
  // 3 interleaved passes, query x dir back-to-back (skew_probe discipline)
  for (pass <- 1 to 3; n <- names; d <- Seq(small, big)) {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(n)(spark, d)
      .write.mode("overwrite").format("noop").save()
    val t = (System.nanoTime() - t0) / 1e9
    val k = (n, d)
    best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
  }
  names.map { n =>
    val s = best((n, small)); val b = best((n, big))
    f"$n%-26s sf0.1 ${s}%6.2f s   sf1 ${b}%6.2f s   x${b / s}%.2f"
  }.mkString("\n")
}
println(report)
sys.exit(0)
