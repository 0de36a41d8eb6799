// Round-18 optimization A/B probe: warm per-query timings (settle style,
// N runs, min + all samples printed) for a comma-separated query list.
// Run:
//   SPARK_GRAFT_PROBE_QUERIES=q135_token_budget,... [SPARK_GRAFT_PROBE_RUNS=4]
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/opt_probe_r18.scala < /dev/null
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "4").toInt
val names = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "").split(',').map(_.trim).filter(_.nonEmpty).toSeq
val sp = graft.Sessions.local("opt-probe-r18")
Seq("lineitem", "orders", "documents", "embeddings", "events").foreach(t => sp.read.parquet(s"$sfDir/$t.parquet").count())
for (n <- names) {
  val fn = graft.SparkEntry.queries(n)
  val ts = (1 to runs).map { _ =>
    val t0 = System.nanoTime()
    fn(sp, sfDir).write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"OPTPROBE $n%-28s min=${ts.min}%6.2f  " + ts.map(t => f"$t%.2f").mkString(" "))
}
println("OPTPROBE_DONE")
System.exit(0)
