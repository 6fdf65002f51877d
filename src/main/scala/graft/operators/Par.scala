package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-bound expression stages.
  *
  * Parquet can only split at row-group boundaries, so a small input (or one
  * written with giant row groups) arrives as fewer partitions than cores and
  * pins per-row CPU work (shingling, hashing, vector math) to one thread.
  * [[spread]] repartitions ONLY in that case: on a 100 TB input with normal
  * row-group sizing the scan already has >= cores splits and this is a
  * no-op — no extra shuffle is ever introduced at scale.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
