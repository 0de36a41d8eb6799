// Round-18 optimization: dump explain("formatted") for a query list to
// plans/r18/<shortname>_<tag>.txt (tag from SPARK_GRAFT_PLAN_TAG, default
// "before"). Streaming-drain queries (q55/q61/q70/q72/q73/q106-q110/q123)
// return a post-drain memory-sink table whose plan is a LocalTableScan —
// their cost is the micro-batch machinery, so their dump records the
// drained-result plan plus a note.
// Run:
//   SPARK_GRAFT_PLAN_QUERIES=q88_curation_funnel,... \
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/plan_dump_r18.scala < /dev/null
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
val names = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERIES", "").split(',').map(_.trim).filter(_.nonEmpty).toSeq
val sp = graft.Sessions.local("plan-dump-r18")
val outDir = new java.io.File("plans/r18"); outDir.mkdirs()
for (n <- names) {
  val df = graft.SparkEntry.queries(n)(sp, sfDir)
  val plan = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
  val short = n.split('_').head
  val f = new java.io.File(outDir, s"${short}_$tag.txt")
  val fw = new java.io.FileWriter(f)
  try { fw.write(s"== $n @ $sfDir ==\n"); fw.write(plan) } finally fw.close()
  println(s"PLAN_DUMPED $n -> ${f.getPath} (${plan.length} chars)")
}
println("PLAN_DUMP_DONE")
System.exit(0)
