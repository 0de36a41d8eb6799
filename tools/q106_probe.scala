// q106 streaming cell monitor, sf0.1 -> sf1 scaling on the SAME session:
// the monitor's state is O(cells) and the cost is one streamed assignment
// pass + a broadcast centroid join, so wall must scale ~linearly with the
// corpus (micro-batch commit overhead is fixed). Also prints the state-op
// row counts after the big drain (must be = cells, never = arrivals).
// Usage: /opt/spark/bin/spark-shell --driver-memory 48g \
//   --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/q106_probe.scala < /dev/null
val report: String = {
  val small = "/root/testdata/sf0.1"
  val big = "/root/repo/target/sf1"
  for (d <- Seq(small, big))
    spark.read.parquet(s"$d/embeddings.parquet").count()
  val best = scala.collection.mutable.Map[String, Double]()
  var bigState: Seq[(String, Long, Long, Long)] = Nil
  for (pass <- 1 to 3; d <- Seq(small, big)) {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q106_stream_cell_monitor")(spark, d)
      .write.mode("overwrite").format("noop").save()
    val t = (System.nanoTime() - t0) / 1e9
    best(d) = math.min(best.getOrElse(d, Double.MaxValue), t)
    if (d == big) bigState = graft.streaming.StreamReplay.lastStateOps
  }
  val s = best(small); val b = best(big)
  f"q106_stream_cell_monitor   sf0.1 ${s}%6.2f s   sf1 ${b}%6.2f s   x${b / s}%.2f" +
    s"\nsf1 state ops (name, rowsTotal, updated, droppedByWatermark): $bigState"
}
println(report)
sys.exit(0)
