package graft

import java.sql.Timestamp

import graft.streaming.{EventStreams, StatefulSessions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom-state sessionizer must agree with the built-in session_window
  * on a realistic (time-ordered) replay. A far-future sentinel event pushes
  * the watermark past every session's gap horizon so event-time timeouts
  * flush the tail sessions.
  */
class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sessions equal session_window sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val static = Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
    val rows = static.as[Ev].collect().sortBy(_.ts.getTime)
    val sentinel = Ev(
      new Timestamp(rows.last.ts.getTime + 6L * 3600 * 1000),
      -1L, -1L, "sentinel", 0.0)

    val stream = MemoryStream[Ev]
    val (b1, b2) = rows.splitAt(rows.length / 2)
    stream.addData(b1)
    val q = StatefulSessions.sessionizeWithState(stream.toDF())
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("state_sessions")
      .filter(col("user_id") >= 0)
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(_.toSeq.toVector).toSet
    val want = EventStreams.sessionize(static)
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(_.toSeq.toVector).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("late event inside the admitted window does not crash the timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[Ev]
    // With no-data batches disabled, the late-events watermark lags the
    // eviction watermark by one batch: batch 1's sentinel (13:00) moves the
    // eviction watermark to 11:00 for batch 2, but batch 2 still ADMITS
    // events against batch 1's 0 watermark. Its 10:20 event merges into the
    // open 10:00 session, whose end+gap (10:50) is behind the 11:00 eviction
    // watermark — without the clamp, setTimeoutTimestamp throws and the
    // query dies on data the watermark explicitly admitted.
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val saved = spark.conf.get(noData)
    spark.conf.set(noData, "false")
    val q = StatefulSessions.sessionizeWithState(stream.toDF())
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        Ev(ts(10, 0), 1L, 1L, "click", 0.0),
        Ev(ts(13, 0), -1L, -1L, "sentinel", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(ts(10, 20), 2L, 1L, "click", 0.0)))
      q.processAllAvailable()
      // two watermark-advancing batches: the first lifts the eviction
      // watermark past the clamped timeout, the second fires it
      stream.addData(Seq(Ev(ts(20, 0), -2L, -1L, "sentinel", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(ts(21, 0), -3L, -1L, "sentinel", 0.0)))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.set(noData, saved)
    }
    val got = spark.table("late_sessions").filter(col("user_id") === 1L)
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(_.toSeq.toVector).toSet
    val us = (t: Timestamp) => t.getTime * 1000L
    assert(got === Set(Vector(1L, 2L, us(ts(10, 0)), us(ts(10, 20)))))
  }
}
