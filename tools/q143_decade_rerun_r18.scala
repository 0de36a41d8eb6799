// Round-18: q143 decade re-measure AFTER the fingerprint-class collapse
// (the sf10 sweep died disk-full on the id-level pigeonhole join).
// Run (each scale):
//   SPARK_GRAFT_SF_DIR=target/sf1 /opt/spark/bin/spark-shell --driver-memory 24g \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/q143_decade_rerun_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
val sp = graft.Sessions.local("q143-decade-rerun")
sp.read.parquet(s"$sfDir/documents.parquet").count()
val t0 = System.nanoTime()
graft.SparkEntry.queries("q143_audio_neardup")(sp, sfDir)
  .write.mode("overwrite").format("noop").save()
println(f"DECADE $sfDir q143_audio_neardup ${(System.nanoTime() - t0) / 1e9}%9.2f s")
sp.stop()
