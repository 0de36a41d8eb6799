// q109 streaming gate monitor: sf0.1 -> sf1 decade scaling plus the
// dup-heavy row, on one resident session. Scoring is stateless per-row
// codegen (md5 over each token occurrence), so the wall must scale
// ~linearly with total token mass; state is O(open windows x sources x 2)
// and the emitted row count tracks windows, never docs. On the dup-heavy
// fixture the admitted/rejected split shifts but the plan shape is
// unchanged, so the wall must stay ~x1 vs clean sf1.
// Usage: same spark-shell confs as tools/q108_probe.scala.
val report: String = {
  val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1",
    "sf1" -> "/root/repo/target/sf1", "sf1skew" -> "/root/repo/target/sf1skew")
  graft.SparkEntry.queries("q109_stream_gate_monitor")(
    spark, "/root/testdata/sf0.001").count() // warm
  val best = scala.collection.mutable.Map[String, Double]()
  val rows = scala.collection.mutable.Map[String, Long]()
  val state = scala.collection.mutable.Map[String, Long]()
  for (pass <- 1 to 2; (name, d) <- dirs) {
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("q109_stream_gate_monitor")(spark, d).count()
    val t = (System.nanoTime() - t0) / 1e9
    best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
    rows(name) = n
    state(name) = graft.streaming.StreamReplay.lastStateOps.map(_._2).sum
    println(f"[q109-probe] pass$pass $name $t%.2f s rows=$n state=${state(name)}")
  }
  f"q109_stream_gate_monitor   sf0.1 ${best("sf0.1")}%6.2f s (rows ${rows("sf0.1")}, state ${state("sf0.1")})" +
    f"   sf1 ${best("sf1")}%6.2f s (rows ${rows("sf1")}, state ${state("sf1")}) (x${best("sf1") / best("sf0.1")}%.2f)" +
    f"\nsf1skew ${best("sf1skew")}%6.2f s (rows ${rows("sf1skew")}, state ${state("sf1skew")}) (x${best("sf1skew") / best("sf1")}%.2f vs clean sf1)"
}
println(report)
sys.exit(0)
