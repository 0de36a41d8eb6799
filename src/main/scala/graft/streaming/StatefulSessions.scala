package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom session state for the streaming tier — the
  * flatMapGroupsWithState escape hatch SURVEY §2.8 reserves for semantics
  * session_window can't express (e.g. emitting per-session aggregates with
  * custom close rules). Semantics here intentionally MATCH session_window
  * (30-minute gap) so StatefulSessionsSpec can assert equivalence against
  * both the built-in streaming operator and the batch lag-idiom (q15).
  *
  * Scale: state per user is one open session (3 longs) — O(active users),
  * evicted by event-time timeout as the watermark passes sessionEnd+gap.
  */
object StatefulSessions {

  case class OpenSession(start_us: Long, end_us: Long, n: Long)
  case class SessionOut(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  val GapUs: Long = 1800L * 1000000L

  private def updateUser(
      userId: Long,
      events: Iterator[(Long, java.sql.Timestamp)],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.n, s.start_us, s.end_us))
    }
    // arrivals within a micro-batch are unordered; sessionize in time order
    val sorted = events.map { case (_, ts) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts)
    }.toArray.sorted
    var out = List.empty[SessionOut]
    var open = state.getOption
    sorted.foreach { us =>
      open match {
        case Some(s) if us - s.end_us <= GapUs =>
          // min() matters for late arrivals inside the watermark: an event
          // older than the open session's start must extend it backwards,
          // as the batch sort-based form would
          open = Some(OpenSession(math.min(s.start_us, us),
            math.max(s.end_us, us), s.n + 1))
        case Some(s) =>
          out ::= SessionOut(userId, s.n, s.start_us, s.end_us)
          open = Some(OpenSession(us, us, 1))
        case None =>
          open = Some(OpenSession(us, us, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close when the watermark passes the session's gap horizon; clamp to
      // watermark+1 — a valid late event (inside Lateness but > gap late)
      // can put end+gap at/behind the current watermark, and Spark throws
      // for a timeout not strictly later than it
      state.setTimeoutTimestamp(math.max(
        state.getCurrentWatermarkMs() + 1, s.end_us / 1000 + GapUs / 1000))
    }
    out.reverseIterator
  }

  /** events: any frame with (ts timestamp, user_id). Emits closed sessions
    * (append mode); open sessions flush on event-time timeout.
    *
    * Note: no typed .map before groupByKey — a MapElements node would strip
    * the watermark tag from `ts`, and event-time timeout requires the
    * watermarked column to reach the state operator (AppendColumns from
    * groupByKey preserves it).
    */
  def sessionizeWithState(events: DataFrame): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", EventStreams.Lateness)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
