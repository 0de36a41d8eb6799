// Round-16 #7: streaming trigger sizing — the q107/q110 micro-batch knob.
// The registered replays stream ONE fixture file, so Trigger.AvailableNow
// always drains in a single batch and `maxFilesPerTrigger` has never been
// driven. This probe splits sf0.1 documents into 64 part files (how a
// 100 TB/day ingest actually arrives) and drains the q107 band-index core
// under maxFilesPerTrigger in {1, 4, 16, all}, recording wall seconds,
// micro-batch count, and the band-index checksum (keeper-by-lowest-id is
// split-independent, so the checksum must be IDENTICAL at every setting).
// Run:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/trigger_sizing_probe_r16.scala < /dev/null
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

val sp = graft.Sessions.local("trigger-sizing-probe")
import sp.implicits._

val src = "/root/testdata/sf0.1/documents.parquet"
val manyDir = graft.sources.Scratch.dir("trigger_probe_docs")
sp.read.parquet(src).repartition(64)
  .write.mode("overwrite").parquet(manyDir)
val nFiles = new java.io.File(manyDir).listFiles().count(_.getName.endsWith(".parquet"))
println(s"PROBE files=$nFiles")
val schema = sp.read.parquet(manyDir).schema

def bandsOf(t: org.apache.spark.sql.Column) =
  graft.functions.expressions.sketch.mdBandKeys(t, 3, 8, 2)

var seq = 0
def drainIndex(maxFiles: Option[Int]): (Double, Int, (Long, Long)) = {
  seq += 1
  val sink = s"trigger_probe_$seq"
  val reader = sp.readStream.schema(schema)
  val reader2 = maxFiles.fold(reader)(k =>
    reader.option("maxFilesPerTrigger", k.toString))
  val stream = reader2.parquet(manyDir)
    .select(col("doc_id"), explode(bandsOf(col("text"))).as("band"))
    .groupBy(col("band"))
    .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
  val saved = sp.conf.get("spark.sql.shuffle.partitions")
  sp.conf.set("spark.sql.shuffle.partitions",
    graft.streaming.StreamReplay.StatePartitions)
  val t0 = System.nanoTime()
  val q = stream.writeStream.format("memory").queryName(sink)
    .outputMode("complete").trigger(Trigger.AvailableNow()).start()
  q.awaitTermination()
  val batches = q.recentProgress.length
  q.stop()
  sp.conf.set("spark.sql.shuffle.partitions", saved)
  val wall = (System.nanoTime() - t0) / 1e9
  val r = sp.table(sink)
    .select(xxhash64(col("band"), col("n"), col("keeper")).as("h"))
    .agg(count(lit(1)), expr("bit_xor(h)")).collect().head
  (wall, batches, (r.getLong(0), r.getLong(1)))
}

// warm-up drain (codegen + state-store init) so setting #1 isn't billed
drainIndex(None)
for (setting <- Seq(Some(1), Some(4), Some(16), None)) {
  // min of 2 per setting: micro-batch walls are commit-latency noisy
  val a = drainIndex(setting)
  val b = drainIndex(setting)
  val best = if (a._1 <= b._1) a else b
  assert(a._3 == b._3, s"nondeterministic index at $setting: ${a._3} vs ${b._3}")
  println(f"PROBE maxFilesPerTrigger=${setting.getOrElse(-1)}%3d " +
    f"batches=${best._2}%3d wall=${best._1}%6.2f s " +
    f"checksum=${best._3._1}:${best._3._2}")
}
println("PROBE done")
sys.exit(0)
