// q110 streaming funnel rollup: sf0.1 -> sf1 decade scaling plus the
// dup-heavy row, on one resident session. Two chained stateful levels: the
// (window, hash) dedup state is the remember-what-you've-seen floor BOUNDED
// by the watermark horizon (never all-time), the rollup state is O(open
// windows). On the dup-heavy fixture level-1 state SHRINKS (copies collapse
// onto shared hashes inside their window) while arrivals stay equal, so the
// wall must stay ~x1 vs clean sf1.
// Usage: same spark-shell confs as tools/q108_probe.scala.
val report: String = {
  val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1",
    "sf1" -> "/root/repo/target/sf1", "sf1skew" -> "/root/repo/target/sf1skew")
  graft.SparkEntry.queries("q110_stream_funnel_rollup")(
    spark, "/root/testdata/sf0.001").count() // warm
  val best = scala.collection.mutable.Map[String, Double]()
  val rows = scala.collection.mutable.Map[String, Long]()
  val state = scala.collection.mutable.Map[String, Long]()
  for (pass <- 1 to 2; (name, d) <- dirs) {
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("q110_stream_funnel_rollup")(spark, d).count()
    val t = (System.nanoTime() - t0) / 1e9
    best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
    rows(name) = n
    state(name) = graft.streaming.StreamReplay.lastStateOps.map(_._2).sum
    println(f"[q110-probe] pass$pass $name $t%.2f s rows=$n state=${state(name)}")
  }
  f"q110_stream_funnel_rollup   sf0.1 ${best("sf0.1")}%6.2f s (rows ${rows("sf0.1")}, state ${state("sf0.1")})" +
    f"   sf1 ${best("sf1")}%6.2f s (rows ${rows("sf1")}, state ${state("sf1")}) (x${best("sf1") / best("sf0.1")}%.2f)" +
    f"\nsf1skew ${best("sf1skew")}%6.2f s (rows ${rows("sf1skew")}, state ${state("sf1skew")}) (x${best("sf1skew") / best("sf1")}%.2f vs clean sf1)"
}
println(report)
sys.exit(0)
