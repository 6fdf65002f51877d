package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the event schema
  * `(event_id, ts TIMESTAMP, user_id, event_type, value)`.
  *
  * Each transform takes a DataFrame that may be batch OR streaming — the
  * logical plan is identical (the batch twins are exercised by the oracle
  * queries q60-q66; the streaming behavior — watermarks, late-data drop,
  * session windows, stateful dedup — is pinned by EventStreamSpec with
  * MemoryStream sources).
  *
  * Scale design: state is keyed by (window[, type]) / session_window /
  * event_id — all bounded by the watermark horizon, so state size is
  * O(keys-in-horizon), independent of total stream length.
  */
object EventStream {

  /** Tumbling-window counts per event type with late-data tolerance
    * `watermark` (e.g. "2 hours"). Append-mode safe: windows finalize once
    * the watermark passes window end.
    */
  def tumblingTypeCounts(events: DataFrame, windowDur: String,
                         watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding-window event rate: counts over `windowDur` windows advancing
    * every `slideDur`.
    */
  def slidingCounts(events: DataFrame, windowDur: String, slideDur: String,
                    watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Session windows per user (native `session_window`, `gap` e.g.
    * "30 minutes") — the streaming twin of Events.sessionize; state per
    * open session, closed by the watermark.
    */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Exactly-once-per-event-id dedup bounded by the watermark horizon —
    * the streaming ingest guard for at-least-once sources.
    */
  def dedupByEventId(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateless high-value alert stream (filter + project only — no state,
    * no shuffle; runs fully pipelined).
    */
  def highValueAlerts(events: DataFrame, threshold: Double): DataFrame =
    events.filter(col("value") >= threshold)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
}
