package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum with NO single-partition stage — the shared
  * machinery behind [[Metrics.cumOverScores]]'s ungrouped path (AUROC rank
  * accumulation) and [[Curate.packSequences]]'s shard-free packing, which
  * previously each carried their own copy of it.
  *
  * Discipline: bucket rows by an AFFINE image of a monotone order-key
  * expression (equal keys share a bucket, key order is preserved, so
  * buckets are order-contiguous), run the cumulative window LOCALLY per
  * bucket, and add broadcast per-bucket exclusive offsets computed from
  * the ≤ shuffle.partitions-row totals table via a TRIANGULAR self-join
  * (O(p²) pairs, hash-aggregated in parallel — cheaper than any
  * single-partition window stage). The result is bit-identical to a
  * global `Window.orderBy` cumulative sum over long values, but no task
  * ever sees more than its bucket.
  */
private[graft] object PrefixSum {

  /** Adds `outCol` = the INCLUSIVE running sum of `valueCol` in
    * `orderCol` order. `orderImage` must be a monotone numeric image of
    * the order key (often the key itself); null keys bucket first, like
    * Spark's default null-first ordering. Exclusive variants subtract
    * `valueCol` from the result (exact for long values).
    */
  def inclusiveCum(df: DataFrame, valueCol: Column, orderCol: Column,
                   orderImage: Column, outCol: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = df.agg(min(orderImage).as("__psLo"), max(orderImage).as("__psHi"))
    val span = col("__psHi").cast("double") - col("__psLo").cast("double")
    val parted = df.crossJoin(broadcast(bounds))
      .withColumn("__psBkt",
        when(orderImage.isNull || col("__psLo").isNull || !(span > 0.0), lit(0))
          .otherwise(least(lit(p - 1),
            floor((orderImage.cast("double") - col("__psLo").cast("double"))
              / span * p).cast("int"))))
      .drop("__psLo", "__psHi")
    val totals = parted.groupBy(col("__psBkt")).agg(sum(valueCol).as("__psT"))
    val offsets = totals.select(col("__psBkt"))
      .join(totals.select(col("__psBkt").as("__psQ"), col("__psT")),
        col("__psQ") < col("__psBkt"), "left")
      .groupBy(col("__psBkt"))
      .agg(coalesce(sum(col("__psT")), lit(0L)).as("__psOff"))
    val wLoc = Window.partitionBy(col("__psBkt")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.withColumn("__psLoc", sum(valueCol).over(wLoc))
      .join(broadcast(offsets), Seq("__psBkt"))
      .withColumn(outCol, col("__psLoc") + col("__psOff"))
      .drop("__psBkt", "__psLoc", "__psOff")
  }
}
