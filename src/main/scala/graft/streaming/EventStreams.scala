package graft.streaming

import graft.functions.num._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming tier (SURVEY §2.8 / M6): the event-time operators of Q14/Q15
  * as Structured Streaming transforms. Each takes any events-shaped frame
  * (`ts` timestamp, `event_id`, `user_id`, `event_type`, `value`) — batch or
  * streaming — so StreamingSpec can assert batch-equivalence directly: the
  * same function applied to a MemoryStream and to the static table must
  * agree once the stream is drained.
  *
  * Watermarks bound state: 2 hours of event-time lateness keeps at most
  * ~3 window groups per key open regardless of corpus size; session state
  * is per-user and evicted on watermark passage. That is the whole 100 TB
  * streaming story — state size is O(active keys), never O(history).
  */
object EventStreams {

  val Lateness = "2 hours"

  /** Q14 twin: watermarked tumbling 1-hour count+sum per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", Lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        unix_millis(col("window.start")).as("bucket_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** q40 twin: watermarked sliding 1-hour/30-minute count+sum per
    * event_type. The batch q40 (TimeWindows) delegates here so the streaming
    * and batch forms cannot drift.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", Lateness)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        unix_millis(col("window.start")).as("bucket_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** Q15 twin: built-in session_window with a 30-minute gap. Note the gap
    * boundary: session_window merges an event only if it lands strictly
    * inside the previous event's [ts, ts+gap) extension, while the batch
    * lag-idiom keeps `diff == gap` in-session — indistinguishable on
    * microsecond data.
    */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", Lateness)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))

  /** Streaming exact dedup: first occurrence per event_id wins; state
    * bounded by the watermark (duplicates must arrive within Lateness).
    * dropDuplicatesWithinWatermark is the variant that actually evicts on
    * watermark passage — plain dropDuplicates("event_id") keeps every id
    * ever seen because the event-time column is not part of the dedup key.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", Lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream range join — the streaming twin of the batch binned
    * range join (Advanced.q36): clicks matched to purchases by the same
    * user within the hour before the purchase. Both sides watermarked; the
    * time-range condition bounds the join state (clicks are droppable once
    * the purchase watermark passes ts + 1h).
    */
  def clicksBeforePurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", Lateness)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", Lateness)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"))
  }
}
