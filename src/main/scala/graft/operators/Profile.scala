package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column summary statistics in ONE pass — the
  * first thing anyone runs against an unfamiliar 100 TB table, and the
  * input to partition/skew planning.
  *
  * Plan shape: a single hash-free global aggregate computes 4×k metrics
  * with map-side partials (one number per metric per partition crosses the
  * wire), then a `stack` generator pivots the single result row to long
  * format — profiling cost is one scan regardless of column count, never
  * k scans.
  *
  * Metric choice is determinism-first: count / null-count are exact
  * integers, min / max involve NO summation (order-independent, replays
  * bit-for-bit in any engine). Mean/stddev are deliberately absent — a
  * float sum is partition-order-dependent; callers wanting moments use the
  * exact fixed-point pattern ([[Similarity.groupCentroids]]) instead.
  */
object Profile {

  /** Profile numeric columns: `(col_name, n, n_null, min_v, max_v)` per
    * column, min/max rounded to 6 decimals as doubles.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__nn`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n, n_null, min_v, max_v)")
  }

  /** Corpus vocabulary-size estimate via the KMV distinct sketch
    * ([[graft.functions.KmvSketch]]): one row —
    * `(n_units, n_mins, kth_min, est_distinct)` — from ONE bounded
    * aggregate over the tokenized corpus; `n_units` counts the sketched
    * units (tokens at shingleN = 1, adjacent n-grams at shingleN > 1).
    * The scale contrast this
    * operator exists for: `distinct().count()` on 100 TB of tokens
    * shuffles every distinct token across the wire (vocabulary-sized);
    * here each partition forwards ≤k longs and the driver reads ONE row
    * (the q5l bounded-fit discipline), with the final BigInt estimate
    * computed once driver-side (the DSIR ln precedent — the only
    * >64-bit arithmetic stays off the data plane).
    *
    * Everything is a deterministic function of the input set: hash =
    * the engine-portable md5-60-bit chain, estimate = exact integer
    * floor division — so the q7c oracle replays the whole row, sketch
    * values included, bit-for-bit (HUGEINT on the DuckDB side).
    * `kth_min` is null while the sketch is unsaturated (the estimate is
    * then the exact distinct count — the sketch IS the distinct set).
    *
    * `shingleN` > 1 sketches adjacent n-token grams instead of unigrams
    * (distinct n-gram cardinality — the dedup-planning statistic): plain
    * adjacent grams (the NgramLm construction, short docs emit none),
    * NOT the WordShingles whole-doc collapse.
    */
  def vocabSketch(docs: DataFrame, text: String, k: Int,
                  shingleN: Int = 1): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    val spark = docs.sparkSession
    import spark.implicits._
    // the fused per-doc kernel: the aggregate sees ONE <= k-array per
    // document instead of one exploded row per gram (the composed form,
    // kept below for the spec's bit-equality pin, measured 5.7x behind
    // its twin at 100x on gram-row churn). The two projections stay
    // separate (the kernel alias is non-cheap and multiply-referenced),
    // so the kernel runs once per row.
    val row = docs
      .select(graft.expressions.KmvMins(col(text), shingleN, k).as("__s"))
      .select(col("__s").getField("mins").as("__m"),
        col("__s").getField("n").as("__n"))
      .agg(graft.functions.KmvUnion.kmvUnion(col("__m"), k).as("mins"),
        coalesce(sum(col("__n")), lit(0L)).as("n"))
      .collect().head // bounded by contract: one row, <= k longs
    val mins = row.getSeq[Long](0)
    val kth: Option[Long] =
      if (mins.length < k) None else Some(mins.last)
    Seq((row.getLong(1), mins.length.toLong, kth,
        graft.functions.KmvSketch.estimate(mins, k)))
      .toDF("n_units", "n_mins", "kth_min", "est_distinct")
  }

  /** The composed-builtins form of [[vocabSketch]] — the fused kernel's
    * semantic specification (adjacent n-grams by `slice`+`concat_ws`,
    * the md5-60-bit `conv` chain, one exploded row per gram through the
    * value-at-a-time [[graft.functions.KmvSketch]]), kept for the spec's
    * bit-equality pin.
    */
  private[graft] def vocabSketchComposed(docs: DataFrame, text: String,
                                         k: Int, shingleN: Int): DataFrame = {
    require(k >= 2 && shingleN >= 1, s"bad k/shingleN: $k/$shingleN")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = graft.functions.TextFunctions.tokens(col(text))
    val grams =
      if (shingleN == 1) toks
      else when(size(toks) < shingleN, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (shingleN - 1)),
          i => concat_ws(" ", slice(toks, i, lit(shingleN)))))
    val row = docs
      .select(explode(grams).as("__t"))
      .select(conv(substring(md5(col("__t")), 1, 15), 16, 10)
        .cast("long").as("__h"))
      .agg(graft.functions.KmvSketch.kmv(col("__h"), k).as("mins"),
        count(lit(1)).as("n"))
      .collect().head
    val mins = row.getSeq[Long](0)
    val kth: Option[Long] =
      if (mins.length < k) None else Some(mins.last)
    Seq((row.getLong(1), mins.length.toLong, kth,
        graft.functions.KmvSketch.estimate(mins, k)))
      .toDF("n_units", "n_mins", "kth_min", "est_distinct")
  }
}
