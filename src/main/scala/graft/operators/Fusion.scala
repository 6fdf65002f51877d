package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decision fusion — the reference's flagship analytics
  * (patient_data_integration.ipynb cells 15/19/22, SURVEY.md §2 H2-H4).
  *
  * The semantic centerpiece (SURVEY.md §4.2): when the CNN's confidence in
  * its predicted class is <= v (INCLUSIVE, ipynb:1512 `s <= 0.7`), replace
  * BOTH the prediction and the score with the metadata classifier's.
  */
object Fusion {

  /** Naive decision fusion (H3, ipynb:1485-1530). `cnn` must carry
    * (key, cnn_pred, cnn_conf, cnn_score1); `rf` carries
    * (key, rf_pred, rf_score1). Output adds fused_pred / fused_score1.
    *
    * The rf side is per-slide metadata-derived (small relative to tile
    * data) — broadcast it so the fusion join never shuffles the score table.
    */
  def naive(cnn: DataFrame, rf: DataFrame, key: String,
            v: Double = 0.7): DataFrame = {
    val joined = cnn.join(broadcast(rf), Seq(key))
    joined
      .withColumn("fused_pred",
        when(col("cnn_conf") <= lit(v), col("rf_pred")).otherwise(col("cnn_pred")))
      .withColumn("fused_score1",
        when(col("cnn_conf") <= lit(v), col("rf_score1")).otherwise(col("cnn_score1")))
  }

  /** Threshold sweep (H2, ipynb:1277-1392): for each threshold v, the count
    * of "uncertain" slides (confidence <= v) and the accuracy of the fused
    * decision. One cross join + one grouped aggregation replaces the
    * reference's per-threshold Python loop (SURVEY.md §3.3).
    */
  /** H4 (uncertain-subset fusion comparison, ipynb:1563-1601): for each
    * confidence threshold v, restrict to rows where the base model's
    * confidence is <= v (the "uncertain" partition) and report each
    * candidate model's balanced accuracy there, plus the partition size.
    * One melt + broadcast threshold fan-out + grouped BA — the notebook's
    * nested v × model Python loops as a single shuffle.
    */
  def uncertainSubsetBA(df: DataFrame, conf: Column, label: Column,
                        models: Seq[(String, Column)],
                        thresholds: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // melt via ONE generator pass (an N-way union of selects over df would
    // re-execute df's upstream once per model), and compute BA + subset
    // size from ONE aggregation to (v, model, y) granularity (separate
    // ba/count branches would run the melt+fan-out twice — the same
    // two-consumer defect Metrics.evalSuite exists for)
    val melted = df
      .select(label.as("y"), conf.as("conf"),
        explode(array(models.map { case (name, p) =>
          struct(lit(name).as("model"), p.as("pred"))
        }: _*)).as("m"))
      .select(col("m.model").as("model"), col("m.pred").as("pred"),
        col("y"), col("conf"))
    val expanded = melted.crossJoin(broadcast(thresholds.toDF("v")))
      .filter(col("conf") <= col("v"))
    val perClass = expanded.groupBy(col("v"), col("model"), col("y"))
      .agg(avg(when(col("pred") === col("y"), 1.0).otherwise(0.0)).as("__recall"),
        count(lit(1)).as("__n"))
    perClass.groupBy(col("v"), col("model"))
      .agg(avg(col("__recall")).as("balanced_accuracy"),
        sum(col("__n")).as("n_uncertain"))
  }

  def thresholdSweep(fusedInput: DataFrame, thresholds: Seq[Double],
                     label: Column): DataFrame = {
    val spark = fusedInput.sparkSession
    import spark.implicits._
    val vs = thresholds.toDF("v")
    fusedInput.crossJoin(broadcast(vs))
      .withColumn("__fp",
        when(col("cnn_conf") <= col("v"), col("rf_pred")).otherwise(col("cnn_pred")))
      .groupBy(col("v"))
      .agg(
        sum(when(col("cnn_conf") <= col("v"), 1L).otherwise(0L)).as("n_uncertain"),
        avg(when(col("__fp") === label, 1.0).otherwise(0.0)).as("fused_acc"))
      .orderBy(col("v"))
  }
}
