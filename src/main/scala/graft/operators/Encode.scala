package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature encodings — the reference's `encodings_v1` family
  * (PDI_classes_and_functions/functions_v2.py:142-220): min-max scaling,
  * one-hot encoding, right-inclusive age bucketing, identity.
  *
  * All encodings are pure column expressions (whole-stage-codegen friendly);
  * scaling bounds come from a distributed agg broadcast back as a one-row
  * cross join, so the fact table is never shuffled.
  */
object Encode {

  /** `scale01`: (x - min) / (max - min) (functions_v2.py:154-163). */
  def scale01(df: DataFrame, c: String, out: String): DataFrame = {
    val bounds = df.agg(min(col(c)).as("__min"), max(col(c)).as("__max"))
    // constant column: sklearn's minmax_scale treats scale 0 as 1 (output
    // 0.0); the unguarded division would RAISE under ANSI mode
    val span = col("__max") - col("__min")
    df.crossJoin(broadcast(bounds))
      .withColumn(out,
        when(span > 0, (col(c) - col("__min")) / span)
          .otherwise(when(col(c).isNotNull, lit(0.0))))
      .drop("__min", "__max")
  }

  /** One-hot as separate integer columns `<out>_<v>` for each value in
    * `values` (functions_v2.py:165-193 encodes to fixed-width 0/1 lists;
    * flat columns are the relational equivalent and stay codegen'd).
    */
  def oneHotCols(df: DataFrame, c: String, values: Seq[Int], out: String): DataFrame =
    values.foldLeft(df) { (d, v) =>
      d.withColumn(s"${out}_$v", when(col(c) === lit(v), 1).otherwise(0))
    }

  /** One-hot as a single ArrayType(Int) column — mirrors the reference's
    * list-valued cells (functions_v2.py:165-193), the only nested type in
    * the reference's data model (SURVEY.md §1.1).
    */
  def oneHotArray(df: DataFrame, c: String, values: Seq[Int], out: String): DataFrame =
    df.withColumn(out, array(values.map(v =>
      when(col(c) === lit(v), 1).otherwise(0)): _*))

  /** Right-inclusive bucketing: value <= splits(i) → bucket i, else
    * bucket splits.size. Matches the reference's `classified_2` (<=60) and
    * `classified_3` (<=30 / <=60 / >60) boundary semantics
    * (functions_v2.py:198-218).
    */
  def bucketize(df: DataFrame, c: String, splits: Seq[Double], out: String): DataFrame = {
    val chain = splits.zipWithIndex.foldRight(lit(splits.size): Column) {
      case ((s, i), acc) => when(col(c) <= lit(s), lit(i)).otherwise(acc)
    }
    // null guard: without it a NULL input falls through every `null <= s`
    // branch into the top bucket; nulls must stay null (impute first)
    df.withColumn(out, when(col(c).isNull, lit(null)).otherwise(chain))
  }

  /** Equal-frequency bucketing for continuous stratification columns
    * (SURVEY.md §2 D1: "discretize continuous cols (age → buckets)"). The
    * ntile-window phrasing would funnel all rows through one unpartitioned
    * sort; instead compute approximate quantile cutoffs in one pass
    * (KLL sketch, distributed) and bucketize with the ≤-inclusive chain —
    * two scans, no global sort, scale-safe.
    */
  def quantileBuckets(df: DataFrame, c: String, nBuckets: Int, out: String,
                      relErr: Double = 0.001): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val splits = df.stat.approxQuantile(c, probs, relErr).distinct.sorted
    bucketize(df, c, splits.toIndexedSeq, out)
  }
}
