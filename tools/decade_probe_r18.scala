// Round-18 decade sweep: one noop-write sample per query, serial, in one
// JVM per scale (the r17 protocol — a x10 smoke reads multiples, not
// percents). Targets: the three r17 FLAGs after their fixes (q24 planes,
// q141/q143 decode materialization), the NEW production CC twin q56b, and
// two continuity rows (q112 linear control, q121b served-ANN ~flat).
// q56 and q48 are labeled exact anchors (all-pairs by construction) and
// are deliberately NOT swept — q56b is their production plan.
// Run (each scale):
//   SPARK_GRAFT_SF_DIR=target/sf1  /opt/spark/bin/spark-shell \
//     --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/decade_probe_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
val sp = graft.Sessions.local("decade-r18")
Seq("documents", "embeddings", "lineitem", "events")
  .foreach(t => sp.read.parquet(s"$sfDir/$t.parquet").count())
val qs = Seq(
  "q112_gopher_rules",
  "q121b_ivf_pq_index_serve",
  "q139_bpe_merges",
  "q145_bpe_merges_deepk",
  "q24_embedding_neardup",
  "q56b_dup_clusters_lsh",
  "q141_audio_features",
  "q143_audio_neardup")
for (n <- qs) {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(n)(sp, sfDir)
    .write.mode("overwrite").format("noop").save()
  println(f"DECADE $sfDir $n ${(System.nanoTime() - t0) / 1e9}%9.2f s")
}
sp.stop()
