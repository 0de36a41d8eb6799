// Round-18: q24/q56b decade re-measure AFTER the in-join scoring rewrite
// (vectors ride the bucket join; distinct moved after the threshold
// filter — tools/q24_distinct_probe_r18 has the decomposition that
// motivated it).
// Run (each scale):
//   SPARK_GRAFT_SF_DIR=target/sf1 /opt/spark/bin/spark-shell --driver-memory 24g \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/q24_decade_rerun_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
val sp = graft.Sessions.local("q24-decade-rerun")
sp.read.parquet(s"$sfDir/embeddings.parquet").count()
for (n <- Seq("q24_embedding_neardup", "q56b_dup_clusters_lsh")) {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(n)(sp, sfDir)
    .write.mode("overwrite").format("noop").save()
  println(f"DECADE $sfDir $n ${(System.nanoTime() - t0) / 1e9}%9.2f s")
}
sp.stop()
