package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for the custom stateful sessionizer. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Open-session accumulator kept in the state store (one per user). */
case class SessionAcc(start_us: Long, end_us: Long, n_events: Long,
                      total_value: Double)

/** A finalized session emitted once its inactivity gap has passed the
  * watermark (or a newer event implies it closed).
  */
case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                         n_events: Long, total_value: Double)

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

  /** Watermarked stream-stream interval join: each `leftType` event joins
    * the `rightType` events of the same user within `(left.ts, left.ts +
    * within]`. Both sides carry watermarks and the join condition bounds
    * event-time distance, so Spark can expire join state — the streaming
    * twin of Events.funnelPairs with bounded memory.
    */
  def streamStreamFunnel(events: DataFrame, leftType: String, rightType: String,
                         within: String, watermark: String): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Exactly-once-per-event-id dedup bounded by the watermark horizon —
    * the streaming ingest guard for at-least-once sources.
    */
  def dedupByEventId(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the
    * escape hatch for session semantics `session_window` can't express
    * (custom accumulators, emit-on-close payloads, per-user state machines).
    *
    * State machine per user: events within `gapUs` of the open session's end
    * extend it; a later event closes it (emitted immediately) and opens a
    * new one; the event-time timeout closes the open session once the
    * watermark passes `end + gap`. State is one `SessionAcc` per user —
    * bounded by active users in the watermark horizon, not stream length.
    */
  def statefulSessions(events: DataFrame, gapUs: Long,
                       watermark: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapUs / 1000

    def update(user: Long, evs: Iterator[SessionEvent],
               state: GroupState[SessionAcc]): Iterator[ClosedSession] = {
      def close(s: SessionAcc) =
        ClosedSession(user, s.start_us, s.end_us, s.n_events, s.total_value)
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).iterator
        state.remove()
        out
      } else {
        val closed = Seq.newBuilder[ClosedSession]
        var cur = state.getOption
        // full µs precision: getTime is ms-truncated; the sub-ms component
        // lives in getNanos (the events table is µs-resolution, and the
        // batch twin Events.sessionize compares exact ts_us)
        def micros(ts: java.sql.Timestamp): Long =
          ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000
        // micro-batch events are not ordering-guaranteed; sort by event time
        evs.toSeq.sortBy(e => (micros(e.ts), e.value)).foreach { e =>
          val tus = micros(e.ts)
          cur match {
            case Some(s) if tus - s.end_us <= gapUs =>
              cur = Some(SessionAcc(s.start_us, math.max(s.end_us, tus),
                s.n_events + 1, s.total_value + e.value))
            case Some(s) =>
              closed += close(s)
              cur = Some(SessionAcc(tus, tus, 1, e.value))
            case None =>
              cur = Some(SessionAcc(tus, tus, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(
            math.max(s.end_us / 1000L + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stateless high-value alert stream (filter + project only — no state,
    * no shuffle; runs fully pipelined).
    */
  def highValueAlerts(events: DataFrame, threshold: Double): DataFrame =
    events.filter(col("value") >= threshold)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  private val replayCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Streaming replay of a BOUNDED event table: runs [[statefulSessions]]
    * as a real streaming query — MemoryStream source →
    * `flatMapGroupsWithState` → memory sink — over the given events, then
    * closes every open session by advancing the watermark with a synthetic
    * flush event far past the horizon. Returns the closed-session table
    * `(user_id, start_us, end_us, n_events, total_value)`.
    *
    * This is the verification twin that lets the driver's oracle gate see
    * the streaming engine (stream output == the batch sessionizer == the
    * DuckDB gaps-and-islands SQL — query q6a); the production ingest path
    * is the same transform over `readStream` with no collect. The driver
    * collect here is bounded-input-only by construction (MemoryStream takes
    * local data), not an operator pattern.
    */
  def replaySessions(events: DataFrame, gapUs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .as[SessionEvent].collect()
    if (rows.isEmpty) {
      return spark.emptyDataset[ClosedSession].toDF()
    }
    val maxUs = rows.iterator.map(e =>
      e.ts.getTime * 1000L + (e.ts.getNanos % 1000000) / 1000).max
    // the flush user advances the watermark past every open session's
    // timeout (end + gap), forcing emission; its own session is dropped.
    // Sentinel = an id OUTSIDE the observed user range (a fixed -1 would
    // merge with and then drop a genuine user -1); only a corpus spanning
    // the ENTIRE long range has no such id, and that is rejected.
    val flushUser = {
      val minUser = rows.iterator.map(_.user_id).min
      val maxUser = rows.iterator.map(_.user_id).max
      if (minUser > Long.MinValue) minUser - 1
      else if (maxUser < Long.MaxValue) maxUser + 1
      else throw new IllegalArgumentException(
        "user_id spans the entire Long range; no flush sentinel available")
    }
    val flushTs = new java.sql.Timestamp((maxUs + gapUs) / 1000L + 3600L * 1000)

    val stream = MemoryStream[SessionEvent]
    val sink = s"graft_stream_sessions_${replayCounter.incrementAndGet()}"
    // the replay is a bounded verification harness: a handful of state
    // partitions suffices and saves the per-partition state-store
    // init/commit cost across the micro-batches (the streaming query
    // captures shuffle.partitions at start; restored right after). A
    // production readStream would keep the session's own setting.
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partsKey)
    val query =
      try {
        spark.conf.set(partsKey, math.min(prevParts.toInt, 8).toString)
        statefulSessions(stream.toDF(), gapUs, "0 seconds").toDF()
          .writeStream.format("memory").queryName(sink)
          .outputMode(OutputMode.Append).start()
      } finally spark.conf.set(partsKey, prevParts)
    try {
      stream.addData(rows.toSeq)
      query.processAllAvailable()
      stream.addData(Seq(SessionEvent(flushUser, flushTs, 0.0)))
      query.processAllAvailable()
    } finally query.stop()
    spark.table(sink).filter(col("user_id") =!= flushUser)
  }
}
