package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over an event log `(user_id, ts_us, event_type,
  * value, ...)` — the batch half of the streaming surface (see
  * [[graft.streaming.EventStream]] for the Structured Streaming half; the
  * windowed aggregations are the same logical plans).
  *
  * Scale design: everything partitions by `user_id` (sessionization, funnel)
  * or by a time bucket (windowed aggs) — no global windows, no driver-side
  * state. The funnel "range join" is an equi-join on `user_id` with the time
  * range as a post-join filter, so it shuffles once on the natural key
  * instead of falling into a nested-loop range join.
  */
object Events {

  /** Gaps-and-islands sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapUs` microseconds.
    * Adds `session_id` (1-based per user). One shuffle on `user_id`; the
    * two window functions share the same partitioning.
    */
  def sessionize(df: DataFrame, gapUs: Long,
                 userCol: String = "user_id", tsUsCol: String = "ts_us"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol))
    val prev = lag(col(tsUsCol), 1).over(byUser)
    df.withColumn("__new_session",
        when(prev.isNull || col(tsUsCol) - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Per-session roll-up: event count, span, value total. */
  def sessionStats(df: DataFrame, gapUs: Long,
                   userCol: String = "user_id", tsUsCol: String = "ts_us"): DataFrame =
    sessionize(df, gapUs, userCol, tsUsCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("start_us"),
        max(col(tsUsCol)).as("end_us"),
        sum(col("value")).as("total_value"))

  /** Conversion funnel: pairs (from-event, to-event) of the same user where
    * the to-event lands in `(t_from, t_from + withinUs]`. Equi-join on
    * `user_id` + range filter — broadcast/SMJ-able, skew-safe via AQE.
    */
  def funnelPairs(df: DataFrame, fromType: String, toType: String, withinUs: Long,
                  userCol: String = "user_id", tsUsCol: String = "ts_us"): DataFrame = {
    val from = df.filter(col("event_type") === fromType)
      .select(col(userCol), col(tsUsCol).as("from_us"))
    val to = df.filter(col("event_type") === toType)
      .select(col(userCol), col(tsUsCol).as("to_us"))
    from.join(to, Seq(userCol))
      .filter(col("to_us") > col("from_us") && col("to_us") <= col("from_us") + withinUs)
  }

  /** Backward as-of join: for each left row, the single most recent right
    * row of the same key with `right.ts <= left.ts` (DuckDB/kdb ASOF JOIN
    * semantics; ties take the right row).
    *
    * Spark has no native as-of join; the usual range-join phrasing explodes
    * into a per-key nested loop. This is the union trick instead: tag both
    * sides, sort per key by (ts, side), and carry the last right payload
    * forward with a running `last(ignoreNulls)` window — ONE shuffle on the
    * key, linear work, no row explosion, skew-safe like any keyed window.
    *
    * `rightCols` are the right-side columns to attach (emitted as
    * `asof_<name>`, NULL when no right row precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one right column to attach")
    val payload = struct(rightCols.map(col): _*)
    val l = left.withColumn("__r", lit(null).cast(
        right.select(payload).schema.fields.head.dataType))
      .withColumn("__side", lit(1))
    val r = right.select(col(key), col(tsCol), payload.as("__r"), lit(0).as("__side"))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*).unionByName(l)
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    rightCols.foldLeft(filled) { (acc, c) =>
      acc.withColumn(s"asof_$c", col(s"__last.$c"))
    }.drop("__r", "__side", "__last")
  }

  /** Bucket-banded range join: match each point (`tsUsCol`) to every
    * interval `[startUs, endUs)` that contains it.
    *
    * The naive phrasing is a cross join with a BETWEEN filter —
    * BroadcastNestedLoopJoin, quadratic at scale. Banding instead: explode
    * each interval into the `bucketUs`-wide time buckets it covers, tag each
    * point with its bucket, equi-join on the bucket, and keep the exact
    * containment filter. Work is |points| + Σ interval-width/bucket — a hash
    * join, never a nested loop. Pick `bucketUs` near the typical interval
    * width (amplification = width/bucket + 1 per interval).
    */
  def rangeJoin(points: DataFrame, tsUsCol: String,
                intervals: DataFrame, startUs: String, endUs: String,
                bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val iv = intervals.withColumn("__b",
      explode(sequence(expr(s"$startUs DIV $bucketUs"),
        expr(s"($endUs - 1) DIV $bucketUs"))))
    points.withColumn("__b", expr(s"$tsUsCol DIV $bucketUs"))
      .join(iv, "__b")
      .filter(col(tsUsCol) >= col(startUs) && col(tsUsCol) < col(endUs))
      .drop("__b")
  }

  /** Range join for BOUNDED interval sets — the serving-path variant of
    * [[rangeJoin]]: the intervals collect to the driver (guarded by
    * `maxIntervals` — refuse loudly rather than silently OOM), ride a
    * sorted-containment kernel ([[graft.expressions.IntervalMatch]]:
    * binary search + staircase max-end cutoff, exact for any overlap
    * structure), and each matched point equi-joins the broadcast
    * interval payload by index. ONE codegen'd projection + one broadcast
    * hash join — no interval×bucket explode, no bucket exchange, no
    * containment re-filter, and no `bucketUs` tuning knob to mis-size.
    * Maintenance windows, sessions, campaign periods — the common range
    * joins — are all bounded interval sets; [[rangeJoin]] remains the
    * shape for corpus-sized intervals.
    *
    * Memory cost per interval: the full interval Row collects to the
    * driver, the two 8-byte bounds embed in the [[IntervalMatch]]
    * expression (serialized into every stage's task binary), and the
    * payload Rows become a local-relation broadcast — roughly
    * 16 B/interval in the kernel plus the full row width on the driver
    * and in the broadcast. The default `maxIntervals` (65,536 ≈ 1 MiB of
    * bounds + a few MiB of typical payload) keeps all three genuinely
    * broadcast-scale; raise it only when driver and broadcast budgets are
    * known, and prefer the banded [[rangeJoin]] past a few million rows.
    */
  def rangeJoinBroadcast(points: DataFrame, tsUsCol: String,
                         intervals: DataFrame, startUs: String, endUs: String,
                         maxIntervals: Int = 1 << 16): DataFrame = {
    val spark = points.sparkSession
    // fail on non-integral bounds BEFORE the collect: Row.getLong on a
    // timestamp/decimal column would surface as a bare ClassCastException
    // with no column name, unlike the kernel's explicit BIGINT check on
    // the ts side
    for (c <- Seq(startUs, endUs)) {
      val t = intervals.schema(c).dataType
      require(t == org.apache.spark.sql.types.LongType ||
          t == org.apache.spark.sql.types.IntegerType ||
          t == org.apache.spark.sql.types.ShortType ||
          t == org.apache.spark.sql.types.ByteType,
        s"rangeJoinBroadcast: bound column '$c' must be an integral type " +
          s"(BIGINT-compatible), got ${t.simpleString} — cast it explicitly " +
          "(a timestamp's unit choice is the caller's, not ours)")
    }
    // null-bound intervals define no containment range; the banded
    // rangeJoin drops them implicitly (null bucket keys fall out of the
    // equi-join) — match that here rather than NPE on Row.getLong
    val limited = intervals
      .where(col(startUs).isNotNull && col(endUs).isNotNull)
      .limit(maxIntervals + 1).collect()
    require(limited.length <= maxIntervals,
      s"rangeJoinBroadcast: interval set exceeds $maxIntervals rows — " +
        "raise maxIntervals deliberately or use the banded rangeJoin " +
        "for corpus-sized intervals")
    val sIx = intervals.schema.fieldIndex(startUs)
    val eIx = intervals.schema.fieldIndex(endUs)
    val starts = limited.map(r => r.getAs[Number](sIx).longValue)
    val ends = limited.map(r => r.getAs[Number](eIx).longValue)
    val ivSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__iix",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        intervals.schema.fields.toIndexedSeq)
    val ivRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(limited.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(i +: r.toSeq)
      }: _*)
    val ivIdx = spark.createDataFrame(ivRows, ivSchema)
    points
      .withColumn("__iix", explode(graft.expressions.IntervalMatch(
        col(tsUsCol), starts, ends)))
      .join(broadcast(ivIdx), Seq("__iix"))
      .drop("__iix")
  }

  /** Day-over-day retention: for each day, how many users active that day
    * were also active the next day.
    */
  def dailyRetention(df: DataFrame, tsCol: String = "ts",
                     userCol: String = "user_id"): DataFrame = {
    // both sides of the self-join carry explicit string aliases: the
    // `ud(userCol) === nxt(userCol)` dataframe-column form tripped Spark's
    // "trivially true equals predicate" resolution warning (both Columns
    // resolve to the same attribute id) and was one plan change away from
    // degenerating into a cartesian
    val ud = df.select(col(userCol), date_trunc("day", col(tsCol)).as("d")).distinct()
    val a = ud.as("cur"); val b = ud.as("nxt")
    a.join(b, col(s"cur.$userCol") === col(s"nxt.$userCol") &&
        col("nxt.d") === col("cur.d") + expr("INTERVAL 1 DAY"))
      .groupBy(col("cur.d").as("d"))
      .agg(count(lit(1)).as("retained"))
  }
}
