package graft.ml

import graft.operators.Metrics
import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Patient-metadata classifier (SURVEY.md §2 H5): the reference trains
  * `RandomForestClassifier(n_estimators=121, max_depth=5, bootstrap=False)`
  * on imputed/encoded metadata and reports balanced accuracy on val/test
  * (`patient_data_integration.ipynb:584-637`), with the hyperparameters
  * picked by a commented-out grid search (`ipynb:607-621`).
  *
  * Spark ML mapping: `VectorAssembler` -> `RandomForestClassifier` with the
  * same hyperparameters (`setBootstrap(false)` reproduces the reference's
  * whole-dataset trees); evaluation reuses the engine's own balanced-accuracy
  * aggregation (Metrics.balancedAccuracy) on the prediction column, and the
  * grid search is a driver loop selecting on val BA exactly like the
  * reference — not CrossValidator, whose k-fold resampling would change the
  * protocol.
  */
object MetaClassifier {

  /** Reference hyperparameters (ipynb:624-630). */
  case class Config(numTrees: Int = 121, maxDepth: Int = 5,
                    bootstrap: Boolean = false, seed: Long = 0L)

  private def assemble(df: DataFrame, featureCols: Seq[String]): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .transform(df)

  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          cfg: Config = Config()): RandomForestClassificationModel =
    new RandomForestClassifier()
      .setFeaturesCol("features")
      .setLabelCol(labelCol)
      .setNumTrees(cfg.numTrees)
      .setMaxDepth(cfg.maxDepth)
      .setBootstrap(cfg.bootstrap)
      .setSeed(cfg.seed)
      .fit(assemble(train, featureCols))

  /** Score a dataframe; returns input columns + `prediction` (double) and
    * `score1` = P(class 1) extracted from the probability vector.
    */
  def score(model: RandomForestClassificationModel, df: DataFrame,
            featureCols: Seq[String]): DataFrame = {
    val scored = model.transform(assemble(df, featureCols))
    val p1 = vector_to_array(col("probability")).getItem(1)
    scored
      .withColumn("score1", p1)
      .drop("features", "rawPrediction", "probability")
  }

  /** Balanced accuracy of the model on `df` (the reference's val/test
    * metric, sklearn `balanced_accuracy_score` semantics via Metrics).
    */
  def balancedAccuracy(model: RandomForestClassificationModel, df: DataFrame,
                       featureCols: Seq[String], labelCol: String): Double =
    Metrics.balancedAccuracy(
        score(model, df, featureCols),
        col(labelCol).cast("int"), col("prediction").cast("int"))
      .collect()(0).getDouble(0)

  /** Grid search on a validation set (mirrors ipynb:607-621: loop the grid,
    * keep the config with the best val balanced accuracy; ties keep the
    * earlier grid point, like the reference's strict `>` comparison).
    */
  def gridSearch(train: DataFrame, valDf: DataFrame,
                 featureCols: Seq[String], labelCol: String,
                 numTreesGrid: Seq[Int], maxDepthGrid: Seq[Int],
                 seed: Long = 0L): (Config, Double) = {
    val cached = train.cache(); val vCached = valDf.cache()
    try {
      var best: (Config, Double) = (Config(numTreesGrid.head, maxDepthGrid.head, bootstrap = false, seed), -1.0)
      for (nt <- numTreesGrid; md <- maxDepthGrid) {
        val cfg = Config(nt, md, bootstrap = false, seed)
        val ba = balancedAccuracy(fit(cached, featureCols, labelCol, cfg),
          vCached, featureCols, labelCol)
        if (ba > best._2) best = (cfg, ba)
      }
      best
    } finally { cached.unpersist(); vCached.unpersist() }
  }

  /** Export a fitted binary-classification forest as replayable SQL: the
    * returned (voteExpr0, voteExpr1, predExpr, scoreExpr) reference the
    * given feature column names and reproduce MLlib's scoring EXACTLY —
    * bit-for-bit, not approximately — in any engine with IEEE doubles:
    *
    *   - per tree, `predictRaw` walks to a leaf and adds
    *     `classCounts(i) / total` to the vote for class i; the export
    *     renders that leaf quotient as a shortest-repr double literal
    *     (round-trips to the identical double) inside a nested
    *     `CASE WHEN feature <= threshold` matching `ContinuousSplit`
    *     semantics;
    *   - votes sum across trees in tree order (left-associative chain —
    *     the same fold order as `predictRaw`'s loop);
    *   - `prediction = argmax(votes)` with ties to class 0
    *     (`CASE WHEN v1 > v0 THEN 1 ELSE 0`), and
    *     `score1 = v1 / (v0 + v1)` exactly as
    *     `normalizeToProbabilitiesInPlace` divides by the vote sum.
    *
    * This closes the classic MLlib-vs-anything verification gap for
    * SCORING: the fit stays engine-specific, but the fitted model's
    * decision function is replayed by the DuckDB oracle (q34).
    * VERDICT r5 item 4.
    */
  def forestSql(model: RandomForestClassificationModel,
                featureCols: Seq[String]): ForestSql = {
    require(model.numClasses == 2,
      s"binary forests only, got ${model.numClasses} classes")
    import org.apache.spark.ml.graft.TreeBridge
    import TreeBridge.{ExportedBranch, ExportedLeaf, ExportedNode}
    def nodeSql(n: ExportedNode, cls: Int): String = n match {
      case ExportedLeaf(counts) =>
        val total = counts.sum // same sequential sum as predictRaw's
        val p = if (total == 0.0) 0.0 else counts(cls) / total
        p.toString
      case ExportedBranch(f, t, l, r) =>
        s"(CASE WHEN ${featureCols(f)} <= $t THEN ${nodeSql(l, cls)} " +
          s"ELSE ${nodeSql(r, cls)} END)"
    }
    def votes(cls: Int): String = model.trees
      .map(t => nodeSql(TreeBridge.export(t.rootNode), cls))
      .reduceLeft((a, b) => s"$a + $b")
    val (v0, v1) = (s"(${votes(0)})", s"(${votes(1)})")
    ForestSql(v0, v1,
      pred = s"(CASE WHEN $v1 > $v0 THEN 1 ELSE 0 END)",
      score1 = s"($v1 / ($v0 + $v1))")
  }

  /** SQL fragments from [[forestSql]]; `pred`/`score1` are self-contained
    * expressions over the feature columns.
    */
  final case class ForestSql(votes0: String, votes1: String,
                             pred: String, score1: String)

  /** Per-fold train/eval (the H5 protocol): for each fold id, train on the
    * `train` set rows of that fold and report val + test balanced accuracy.
    * Returns one row per fold: (fold, ba_val, ba_test).
    */
  def perFoldEval(foldedMeta: DataFrame, featureCols: Seq[String],
                  labelCol: String, folds: Seq[Int],
                  cfg: Config = Config()): DataFrame = {
    val spark = foldedMeta.sparkSession
    import spark.implicits._
    val cached = foldedMeta.cache()
    try {
      folds.map { f =>
        val fd = cached.filter(col("fold") === f)
        val model = fit(fd.filter(col("set") === "train"), featureCols, labelCol, cfg)
        (f,
          balancedAccuracy(model, fd.filter(col("set") === "val"), featureCols, labelCol),
          balancedAccuracy(model, fd.filter(col("set") === "test"), featureCols, labelCol))
      }.toDF("fold", "ba_val", "ba_test")
    } finally cached.unpersist()
  }
}
