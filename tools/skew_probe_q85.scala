// Dup-heavy probe for the q85-q93 curation family (round-10 mandate #3):
// interleaved clean-vs-skew timing on the SAME session (target/sf1 vs
// target/sf1skew, identical row counts). The q85
// pair-mass assertion lives in tools/pairmass_probe_q85.scala.
// Usage: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/skew_probe_q85.scala < /dev/null
import org.apache.spark.sql.functions._

val clean = "/root/repo/target/sf1"
val skew = "/root/repo/target/sf1skew"
// warm both fixtures' file caches so pass 1 doesn't bill cold reads
for (d <- Seq(clean, skew); t <- Seq("documents", "embeddings"))
  spark.read.parquet(s"$d/$t.parquet").count()

val names = Seq("q85_semantic_dedup", "q86_decontaminate_cut",
  "q87_split_repair", "q88_curation_funnel", "q89_source_cap",
  "q90_eval_contam_report", "q91_lm_fit_score", "q92_hard_negatives",
  "q93_embedding_outliers")

val best = scala.collection.mutable.Map[(String, String), Double]()
def once(name: String, dir: String): Unit = {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, dir)
    .write.mode("overwrite").format("noop").save()
  val t = (System.nanoTime() - t0) / 1e9
  val k = (name, dir)
  best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
}
// 3 interleaved passes; within a pass each query runs clean then skew
// back-to-back, so a load window hits BOTH sides of the ratio equally.
for (pass <- 1 to 3; n <- names; d <- Seq(clean, skew)) once(n, d)

println("query                      sf1(clean)  sf1skew  ratio")
for (n <- names) {
  val c = best((n, clean)); val s = best((n, skew))
  println(f"$n%-26s ${c}%8.2f s ${s}%6.2f s  x${s / c}%.2f")
}
sys.exit(0)
