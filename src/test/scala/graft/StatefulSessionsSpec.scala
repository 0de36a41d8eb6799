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
}
