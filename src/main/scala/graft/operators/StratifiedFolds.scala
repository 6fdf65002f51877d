package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified k-fold splitting — the reference's
  * `IterativeStratification(n_splits, order=1)` pipeline
  * (PDI_classes_and_functions/functions_v2.py:64-140). The contract is the
  * balance invariant the reference itself audits (functions_v2.py:83-96):
  * every fold carries a proportional share of every stratum, and assignment
  * is deterministic for a fixed seed/order.
  *
  * Two implementations with different scale profiles:
  *  - [[assignRoundRobin]] — exact per-stratum round-robin (fold sizes differ
  *    by at most 1 within each stratum). Uses a window partitioned by the
  *    stratum: correct at any size, but strata are few, so the shuffle is
  *    skewed — intended for metadata-sized tables (the reference's 431
  *    slides; fine to ~10^8 rows per stratum).
  *  - [[assignHashed]] — `xxhash64(key, seed) mod k`: embarrassingly
  *    parallel, no shuffle at all, balance holds in expectation (±O(1/sqrt n)
  *    per stratum). This is the 100 TB path.
  */
object StratifiedFolds {

  /** Exact round-robin within each stratum, ordered by `orderBy` (use a
    * stable key for engine-independent determinism, or a seeded rand for
    * the reference's shuffled behavior, functions_v2.py:78).
    */
  def assignRoundRobin(df: DataFrame, strata: Seq[Column], k: Int,
                       orderBy: Column): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(orderBy)
    df.withColumn("fold", (row_number().over(w) - 1) % k)
  }

  /** Shuffle-free stratum-agnostic fold hashing: balanced in expectation
    * within every stratum because the hash is independent of the stratum.
    */
  def assignHashed(df: DataFrame, key: Column, k: Int, seed: Long = 42L): DataFrame =
    df.withColumn("fold", pmod(xxhash64(key, lit(seed)), lit(k)).cast("int"))

  /** Fold → set assignment (functions_v2.py:104-117): the first `nVal` folds
    * are validation, the next `nTest` are test, the rest train.
    */
  def assignSets(df: DataFrame, nVal: Int, nTest: Int): DataFrame =
    df.withColumn("set",
      when(col("fold") < nVal, "val")
        .when(col("fold") < nVal + nTest, "test")
        .otherwise("train"))

  /** Balance audit (functions_v2.py:83-96): per fold, row count, per-class
    * counts for each categorical stratum column, and mean of each continuous
    * column — the "Checkpoint: Equally distributed?" report as a DataFrame.
    */
  def audit(df: DataFrame, classCounts: Map[String, Seq[Any]],
            meanCols: Seq[String]): DataFrame = {
    val countAggs = classCounts.toSeq.sortBy(_._1).flatMap { case (c, vs) =>
      vs.map(v => sum(when(col(c) === lit(v), 1L).otherwise(0L)).as(s"n_${c}_$v"))
    }
    val meanAggs = meanCols.map(c => avg(col(c)).as(s"mean_$c"))
    val aggs = (count(lit(1)).as("n") +: (countAggs ++ meanAggs))
    df.groupBy(col("fold")).agg(aggs.head, aggs.tail: _*).orderBy(col("fold"))
  }
}
