package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numeric profile: exact counts, null counts, min/max in one pass") {
    val df = Seq(
      (Some(1.0), Some(10L)), (Some(2.5), None),
      (None, Some(30L)), (Some(-4.25), Some(20L)))
      .toDF("a", "b")
    val out = Profile.numeric(df, Seq("a", "b"))
      .select("col_name", "n", "n_null", "min_v", "max_v")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(out == Set(
      ("a", 3L, 1L, -4.25, 2.5),
      ("b", 3L, 1L, 10.0, 30.0)), s"got $out")
  }

  test("profile is ONE aggregate: a single scan feeds every metric") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    val plan = Profile.numeric(df, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    // one partial + one final aggregate, and no join/union of per-column scans
    assert(!plan.contains("Union"), s"per-column scans unioned:\n$plan")
  }

  test("KmvSketch: k-min semantics by hand, repeats inert, merge == single pass") {
    val s = new graft.functions.KmvSketch(3)
    // reduce keeps the 3 smallest DISTINCT values in ascending order
    var b = s.zero
    Seq(50L, 10L, 50L, 30L, 20L, 40L, 10L).foreach(v => b = s.reduce(b, v))
    assert(b.toSeq == Seq(10L, 20L, 30L), b.toSeq.toString)
    // merge == the k smallest distinct of the union, any split — incl.
    // the empty-empty edge
    val all = Seq(50L, 10L, 50L, 30L, 20L, 40L, 10L)
    val b1 = all.take(3).foldLeft(s.zero)(s.reduce)
    val b2 = all.drop(3).foldLeft(s.zero)(s.reduce)
    assert(s.merge(b1, b2).toSeq == b.toSeq, "merge diverged from one pass")
    assert(s.merge(s.zero, s.zero).isEmpty)
    // unsaturated estimate is the exact distinct count; saturated is the
    // floor-division formula
    assert(graft.functions.KmvSketch.estimate(Seq(10L, 20L), 3) == 2L)
    assert(graft.functions.KmvSketch.estimate(Seq(10L, 20L, 1L << 59), 3) ==
      ((BigInt(2) << 60) / BigInt(1L << 59)).toLong)
  }

  test("vocabSketch: unsaturated == exact distinct set, layout-invariant, estimate sane, plan bounded") {
    val docs = Seq(
      (1L, "a b c a"), (2L, "b d e"), (3L, "c f"), (4L, "a f g")
    ).toDF("doc_id", "text")
    // k above the true vocabulary (7): the sketch IS the distinct set
    // and the estimate is EXACT
    val exactRow = Profile.vocabSketch(docs, "text", k = 64).collect().head
    assert(exactRow.getLong(0) == 12L, "token count")
    assert(exactRow.getLong(1) == 7L && exactRow.isNullAt(2) &&
      exactRow.getLong(3) == 7L,
      s"unsaturated sketch must be exact: $exactRow")
    // layout invariance: 1 vs 8 partitions produce the identical row
    // (partial merges are exact — the mergeability contract)
    val row8 = Profile.vocabSketch(docs.repartition(8), "text", k = 64)
      .collect().head
    assert(row8.toString == exactRow.toString, "layout changed the sketch")
    // saturated on real data (3-gram cardinality ~16k >> k=256): kth_min
    // present and the estimate within a loose rel-error band of the
    // exact distinct count (k=256 -> ~6% std err; assert 25%)
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val satRow = Profile.vocabSketch(real, "text", k = 256, shingleN = 3)
      .collect().head
    assert(!satRow.isNullAt(2), s"sketch must saturate on 3-grams: $satRow")
    val est = satRow.getLong(3)
    val toks3 = Profile.vocabSketch(real, "text", k = 1 << 20, shingleN = 3)
      .collect().head
    val exact = toks3.getLong(1) // unsaturated giant-k sketch IS exact
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"KMV estimate $est too far from exact $exact")
    // scale shape of the FUSED path: one kernel projection into a
    // partial-merge aggregate — no Generate (no per-gram row explosion)
    // and no cardinality-sized distinct exchange
    val plan = docs
      .select(graft.expressions.KmvMins(col("text"), 3, 256).as("__s"))
      .select(col("__s").getField("mins").as("__m"),
        col("__s").getField("n").as("__n"))
      .agg(graft.functions.KmvUnion.kmvUnion(col("__m"), 256).as("mins"),
        sum(col("__n")).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"per-gram row explosion in the fused sketch plan:\n$plan")
    assert(!plan.contains("hashpartitioning(__"),
      s"cardinality-sized distinct shuffle in the sketch plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a partial-merge aggregate:\n$plan")
  }

  test("vocabSketch fused kernel == composed explode chain, row-for-row") {
    // toy: short docs (< n tokens -> zero grams), repeats, unsaturated
    val docs = Seq(
      (1L, "a b c a b"), (2L, "b d"), (3L, "c f g h c f g"), (4L, "x")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    for (n <- Seq(1, 3); k <- Seq(2, 8, 64)) {
      assert(rows(Profile.vocabSketch(docs, "text", k, n)) ==
        rows(Profile.vocabSketchComposed(docs, "text", k, n)),
        s"fused != composed at n=$n k=$k")
    }
    // real data, saturated at k=256 over 3-grams: the q7c operating point
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(rows(Profile.vocabSketch(real, "text", 256, 3)) ==
      rows(Profile.vocabSketchComposed(real, "text", 256, 3)),
      "fused != composed on testdata at the q7c operating point")
    // per-doc partials: the kernel's mins/count equal the per-doc
    // composed computation (catches row-level drift an aggregate of
    // many docs could mask)
    val perDoc = docs
      .select(col("doc_id"),
        graft.expressions.KmvMins(col("text"), 3, 8).as("__s"))
      .select(col("doc_id"), col("__s.mins"), col("__s.n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toSeq, r.getLong(2)))).toMap
    val composedPerDoc = docs.collect().map { r =>
      val toks = r.getString(1).trim.split("\\s+").toSeq
      val grams = if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      val hashes = grams.map { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        BigInt(1, md.digest(g.getBytes("UTF-8"))).toString(16)
          .reverse.padTo(32, '0').reverse.take(15) }
        .map(h => java.lang.Long.parseLong(h, 16))
      r.getLong(0) ->
        ((hashes.distinct.sorted.take(8), grams.length.toLong))
    }.toMap
    assert(perDoc == composedPerDoc, s"$perDoc\nvs\n$composedPerDoc")
  }
}
