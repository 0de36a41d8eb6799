// Round-18: decompose q143's fingerprint pass at sf0.1 — where do the
// seconds go? (a) clip table alone, (b) decode+window features, (c) full
// fingerprints, (d) fingerprints with an ids-repartition variant, (e) the
// profile tail. Run:
//   /opt/spark/bin/spark-shell --driver-memory 8g \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/q143_decomp_probe_r18.scala < /dev/null
import org.apache.spark.sql.functions._
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val sp = graft.Sessions.local("q143-decomp")
sp.read.parquet(s"$sfDir/documents.parquet").count()
def time(tag: String)(f: => Unit): Unit = { val t0 = System.nanoTime(); f; println(f"DECOMP $tag%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s") }
def noop(df: org.apache.spark.sql.DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
for (i <- 1 to 3) {
  time(s"clips_$i") { noop(graft.operators.Multimodal.audioNeardupTable(sp, sfDir)) }
  time(s"fps_$i") { noop(graft.operators.Multimodal.audioFingerprints(graft.operators.Multimodal.audioNeardupTable(sp, sfDir))) }
  time(s"fps_repart_$i") { noop(graft.operators.Multimodal.audioFingerprints(graft.operators.Multimodal.audioNeardupTable(sp, sfDir).repartition(32, col("media_id")))) }
  time(s"full_q143_$i") { noop(graft.SparkEntry.queries("q143_audio_neardup")(sp, sfDir)) }
}
println("DECOMP_DONE")
System.exit(0)
