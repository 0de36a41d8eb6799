package graft

import java.nio.file.Files

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import scala.reflect.io.Directory

/** Exactly-once restart semantics — the ops property a production stream
  * lives on: a query that stops and restarts from its checkpoint must
  * process only the files that arrived while it was down, emitting no
  * duplicates and losing nothing. Driven end-to-end through the REAL file
  * source → watermarked dedup → parquet sink path (the q61 shape with a
  * durable sink), not a memory harness.
  */
class CheckpointResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-stream restart from checkpoint is exactly-once") {
    val work = Files.createTempDirectory("graft-ckpt").toString
    val srcDir = s"$work/src"
    val sinkDir = s"$work/sink"
    val ckptDir = s"$work/ckpt"

    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // Split by event TIME, not id: the restored watermark survives the
    // restart, so data arriving while the query was down must carry event
    // times at/after it (as a real stream does) — an id-interleaved split
    // would be dropped as late by the dedup state, by design.
    val cut = events.agg(expr("percentile(unix_micros(ts), 0.5)")).head().getDouble(0).toLong
    val (first, second) = (events.filter(unix_micros(col("ts")) < cut),
      events.filter(unix_micros(col("ts")) >= cut))
    // flat landing directory: arriving data = new part-files appended to it
    first.write.parquet(srcDir)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(first.schema).parquet(srcDir)
        .withWatermark("ts", EventStreams.Lateness)
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }

    runOnce() // drain batch 1, stop — checkpoint records progress
    val afterFirst = spark.read.parquet(sinkDir).count()
    assert(afterFirst === first.count())

    second.write.mode("append").parquet(srcDir) // arrives while down
    runOnce() // restart from the SAME checkpoint

    val out = spark.read.parquet(sinkDir)
    assert(out.count() === events.count(), "restart lost or duplicated rows")
    assert(out.select(col("event_id")).distinct().count() === events.count(),
      "restart emitted duplicate event_ids")

    new Directory(new java.io.File(work)).deleteRecursively()
  }
}
