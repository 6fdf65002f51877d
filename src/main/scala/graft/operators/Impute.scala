package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Missing-data handling — the reference's `handling_missing_data`
  * (PDI_classes_and_functions/functions_v2.py:27-62): mean imputation for
  * continuous columns, most-frequent-value (mode) imputation for
  * categoricals, with `np.argmax` tie semantics (lowest value wins a tie,
  * functions_v2.py:43,50,57).
  *
  * Scale design: the fill values are computed with distributed aggregations
  * and attached via a broadcast cross-join of a one-row DataFrame — the plan
  * stays lazy, nothing but single-row aggregates ever reaches the driver, and
  * the data pass is a single map stage (no shuffle of the fact table).
  */
object Impute {

  /** Replace nulls in each column with that column's mean over non-null rows
    * (functions_v2.py:35-39). Columns must be numeric.
    */
  def meanImpute(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => avg(col(c)).as(s"__mean_$c"))
    val means = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(means))
    val filled = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"__mean_$c")))
    }
    filled.drop(cols.map(c => s"__mean_$c"): _*)
  }

  /** Replace nulls in each column with the most frequent non-null value,
    * ties broken toward the LOWEST value — matching the reference's
    * `np.argmax([count(v0), count(v1), ...])` which returns the first
    * (smallest) index on ties (functions_v2.py:41-61).
    */
  def modeImpute(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val mode = d.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
        .orderBy(col("__cnt").desc, col(c).asc)
        .limit(1)
        .select(col(c).as(s"__mode_$c"))
      d.crossJoin(broadcast(mode))
        .withColumn(c, coalesce(col(c), col(s"__mode_$c")))
        .drop(s"__mode_$c")
    }

  /** Count of nulls per column — the reference's missing-data audit print
    * (functions_v2.py:32-33).
    */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
