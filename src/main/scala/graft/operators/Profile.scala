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
}
