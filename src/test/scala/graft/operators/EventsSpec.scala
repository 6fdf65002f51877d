package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private val m = 60L * 1000000  // one minute in micros

  private def evts = Seq(
    // user 1: two sessions (gap at 45 min > 30 min)
    (1L, 0 * m, "view", 1.0), (1L, 10 * m, "click", 2.0),
    (1L, 55 * m, "view", 3.0),
    // user 2: one session
    (2L, 5 * m, "view", 4.0), (2L, 20 * m, "purchase", 5.0)
  ).toDF("user_id", "ts_us", "event_type", "value")

  test("sessionize splits on gaps > gapUs, numbering sessions per user") {
    val out = Events.sessionize(evts, gapUs = 30 * m)
      .select("user_id", "ts_us", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 1L), (1L, 10 * m, 1L), (1L, 55 * m, 2L),
      (2L, 5 * m, 1L), (2L, 20 * m, 1L)))
  }

  test("sessionStats aggregates per session") {
    val out = Events.sessionStats(evts, gapUs = 30 * m)
      .select("user_id", "session_id", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 2L, 9.0)))
  }

  test("sessionize shuffles once: both windows share the user partitioning") {
    val plan = Events.sessionize(evts, gapUs = 30 * m)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single user_id shuffle, got $exchanges:\n$plan")
  }

  test("funnelPairs respects the (from, from+within] window and user equality") {
    val out = Events.funnelPairs(evts, "view", "click", withinUs = 30 * m)
      .select("user_id", "from_us", "to_us").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 10 * m)), s"got $out")
  }

  test("asofJoin attaches the most recent right row at or before each left ts") {
    val clicks = Seq((1L, 100L, "c1"), (1L, 200L, "c2"), (2L, 50L, "c3"))
      .toDF("user_id", "tus", "tag")
    val views = Seq((1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 150L, 15.0), (2L, 60L, 6.0))
      .toDF("user_id", "tus", "v")
    val out = Events.asofJoin(clicks, views, "user_id", "tus", Seq("tus", "v"))
      .select(col("tag"), col("asof_tus"), col("asof_v"))
      .as[(String, Option[Long], Option[Double])].collect()
      .map { case (k, t, v) => k -> ((t, v)) }.toMap
    assert(out("c1") == ((Some(100L), Some(10.0))), s"tie takes the right row: $out")
    assert(out("c2") == ((Some(150L), Some(15.0))))
    assert(out("c3") == ((None, None)), "no prior right row -> nulls")
  }

  test("asofJoin plans one shuffle on the key (no range explosion)") {
    val clicks = Seq((1L, 100L)).toDF("user_id", "tus")
    val views = Seq((1L, 90L, 9.0)).toDF("user_id", "tus", "v")
    val plan = Events.asofJoin(clicks, views, "user_id", "tus", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"must not nested-loop:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"one keyed shuffle expected, got $shuffles:\n$plan")
  }

  test("rangeJoin equals the naive cross+filter and plans a hash join") {
    val points = (0L until 200L by 7L).map(t => (t, s"p$t")).toDF("tus", "ptag")
    val intervals = Seq((0L, 50L, "w0"), (40L, 100L, "w1"), (150L, 160L, "w2"))
      .toDF("s_us", "e_us", "wtag")
    val banded = Events.rangeJoin(points, "tus", intervals, "s_us", "e_us", bucketUs = 16L)
      .select("ptag", "wtag").as[(String, String)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter(col("tus") >= col("s_us") && col("tus") < col("e_us"))
      .select("ptag", "wtag").as[(String, String)].collect().toSet
    assert(banded == naive && naive.nonEmpty)
    val plan = Events.rangeJoin(points, "tus", intervals, "s_us", "e_us", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"banded range join must hash-join:\n$plan")
  }

  test("rangeJoinBroadcast == banded rangeJoin == naive, incl. overlaps, empty set, nulls") {
    val points = ((0L until 200L by 7L).map(t => (Some(t), s"p$t")) :+
      ((None: Option[Long], "pnull"))).toDF("tus", "ptag")
    // overlapping, nested, and disjoint intervals; unsorted input order
    val intervals = Seq(
      (Some(40L), Some(100L), "w1"), (Some(0L), Some(50L), "w0"),
      (Some(150L), Some(160L), "w2"), (Some(45L), Some(47L), "wNested"),
      (Some(45L), Some(200L), "wWide"),
      // null-bound interval: both algorithms must DROP it, not crash
      (None: Option[Long], Some(90L), "wNullStart"))
      .toDF("s_us", "e_us", "wtag")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("ptag", "wtag").as[(String, String)].collect().toSet
    val naive = pairs(points.crossJoin(intervals)
      .filter(col("tus") >= col("s_us") && col("tus") < col("e_us")))
    val banded = pairs(Events.rangeJoin(points, "tus", intervals,
      "s_us", "e_us", bucketUs = 16L))
    val kernel = pairs(Events.rangeJoinBroadcast(points, "tus", intervals,
      "s_us", "e_us"))
    assert(naive.nonEmpty && banded == naive && kernel == naive)
    // empty interval set: empty result, schema preserved
    val empty = Events.rangeJoinBroadcast(points, "tus",
      intervals.limit(0), "s_us", "e_us")
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("tus", "ptag", "s_us", "e_us", "wtag"))
    // the plan is one projection + one broadcast hash join — no bucket
    // explode-join and no post-join containment filter
    val plan = Events.rangeJoinBroadcast(points, "tus", intervals,
      "s_us", "e_us").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // the oversize guard refuses loudly
    val e = intercept[IllegalArgumentException] {
      Events.rangeJoinBroadcast(points, "tus", intervals, "s_us", "e_us",
        maxIntervals = 2)
    }
    assert(e.getMessage.contains("banded"))
    // non-integral bound columns refuse BEFORE the collect, naming the
    // column — not a bare ClassCastException from Row.getLong
    val tsIv = intervals.select(
      timestamp_micros(col("s_us")).as("s_us"), col("e_us"), col("wtag"))
    val e2 = intercept[IllegalArgumentException] {
      Events.rangeJoinBroadcast(points, "tus", tsIv, "s_us", "e_us")
    }
    assert(e2.getMessage.contains("s_us") && e2.getMessage.contains("timestamp"))
    // integer bounds are fine (widened, not refused)
    val intIv = intervals.select(col("s_us").cast("int").as("s_us"),
      col("e_us").cast("int").as("e_us"), col("wtag"))
    assert(pairs(Events.rangeJoinBroadcast(points, "tus", intIv,
      "s_us", "e_us")) == naive)
    // structural equality for the kernel expression: identical bounds in
    // two instances must compare equal (Catalyst semanticEquals/CSE) even
    // though the Array fields would compare by reference
    import graft.expressions.IntervalMatch
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a1 = new IntervalMatch(Literal(1L), Array(1L, 5L), Array(3L, 9L))
    val a2 = new IntervalMatch(Literal(1L), Array(1L, 5L), Array(3L, 9L))
    val a3 = new IntervalMatch(Literal(1L), Array(1L, 5L), Array(3L, 8L))
    assert(a1 == a2 && a1.hashCode == a2.hashCode && a1 != a3)
    assert(a1.semanticEquals(a2) && !a1.semanticEquals(a3))
  }

  test("dailyRetention counts users active on consecutive days") {
    val day = 24L * 3600 * 1000000
    val df = Seq(
      (1L, 0L), (1L, day + 1), (2L, 0L), (3L, day + 1), (1L, 2 * day + 5))
      .toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val out = Events.dailyRetention(df)
      .select(unix_micros(col("d")).as("d"), col("retained"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 1L, day -> 1L))  // u1 retained d0->d1 and d1->d2
  }
}
