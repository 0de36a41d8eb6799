// q108 windowed streaming drift monitor: sf0.1 -> sf1 decade scaling plus
// the dup-heavy row, on one resident session. The wall must scale ~linearly
// with arrivals (one streamed assignment pass; the window arithmetic adds no
// shuffle), and the state gauge must read O(closed windows x cells) emitted
// rows with the store holding only the watermark-open tail — never
// O(arrivals). On the dup-heavy fixture the cell distribution skews but the
// state keying (window, cell) is unchanged, so the wall must stay ~x1.
// Usage: /opt/spark/bin/spark-shell --driver-memory 48g \
//   --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/q108_probe.scala < /dev/null
val report: String = {
  val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1",
    "sf1" -> "/root/repo/target/sf1", "sf1skew" -> "/root/repo/target/sf1skew")
  graft.SparkEntry.queries("q108_stream_windowed_drift")(
    spark, "/root/testdata/sf0.001").count() // warm
  val best = scala.collection.mutable.Map[String, Double]()
  val rows = scala.collection.mutable.Map[String, Long]()
  val state = scala.collection.mutable.Map[String, Long]()
  for (pass <- 1 to 2; (name, d) <- dirs) {
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("q108_stream_windowed_drift")(spark, d).count()
    val t = (System.nanoTime() - t0) / 1e9
    best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
    rows(name) = n
    state(name) = graft.streaming.StreamReplay.lastStateOps.map(_._2).sum
    println(f"[q108-probe] pass$pass $name $t%.2f s rows=$n state=${state(name)}")
  }
  f"q108_stream_windowed_drift   sf0.1 ${best("sf0.1")}%6.2f s (rows ${rows("sf0.1")}, state ${state("sf0.1")})" +
    f"   sf1 ${best("sf1")}%6.2f s (rows ${rows("sf1")}, state ${state("sf1")}) (x${best("sf1") / best("sf0.1")}%.2f)" +
    f"\nsf1skew ${best("sf1skew")}%6.2f s (rows ${rows("sf1skew")}, state ${state("sf1skew")}) (x${best("sf1skew") / best("sf1")}%.2f vs clean sf1)"
}
println(report)
sys.exit(0)
