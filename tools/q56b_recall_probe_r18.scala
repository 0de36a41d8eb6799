// Round-18 #1 (VERDICT r17 top_next): before registering q56b (connected
// components fed by q24's LSH bucketed pairs), establish the oracle
// strategy — is the LSH pair set IDENTICAL to the exact pair set (q48) on
// the driver's fixtures? If yes at sf0.01, q56b can reuse q56's
// recursive-CTE oracle over the exact pair graph (same components by
// identity of edges); the equality itself is then pinned by a spec.
// Run:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/q56b_recall_probe_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sp = graft.Sessions.local("q56b-recall-probe")
for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
  val dir = s"/root/testdata/$sf"
  val lsh = graft.operators.Similarity.q24(sp, dir)
    .select(col("a_id"), col("b_id"))
  val exact = graft.operators.Similarity.q48(sp, dir)
    .select(col("a_id"), col("b_id"))
  val nL = lsh.count(); val nE = exact.count()
  val missed = exact.exceptAll(lsh).count()
  val spurious = lsh.exceptAll(exact).count()
  println(s"PROBE $sf lsh=$nL exact=$nE missed=$missed spurious=$spurious")
}
sp.stop()
