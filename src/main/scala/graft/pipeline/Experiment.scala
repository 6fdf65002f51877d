package graft.pipeline

import graft.operators._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** H6: the end-to-end experiment dataflow (`ExperimentSetup_v2.py:20-298`)
  * minus GPU training — ingest cohorts, impute, stratified folds + set
  * assignment, encode, join injected tile scores, roll up per slide, and
  * produce the per-fold metric report the reference prints.
  *
  * The whole thing is ONE lazy DataFrame DAG per output: cohort union and
  * metadata prep stay unmaterialized until the per-fold aggregations run,
  * so Catalyst fuses ingest->impute->encode into the scan of each cohort.
  *
  * Scoring is injected as a `(slide key, tile scores)` table — the model
  * boundary of SURVEY.md §7.4: the relational engine is testable without a
  * CNN, exactly as the notebook's analytics cells consume score tables the
  * training script materialized earlier.
  */
object Experiment {

  case class Config(
      nFolds: Int = 5, nVal: Int = 1, nTest: Int = 2,
      ageCol: String = "age", catCols: Seq[String] = Seq("gender", "location"),
      labelCol: String = "label", slideCol: String = "slide_name",
      rollupThreshold: Double = 0.5, fusionThreshold: Double = 0.7)

  /** A1/A2/G1: union per-lab cohorts, tagging each with its `lab` id. */
  def ingest(cohorts: Seq[DataFrame]): DataFrame =
    cohorts.zipWithIndex
      .map { case (df, i) => df.withColumn("lab", lit(i)) }
      .reduce(_ unionByName _)

  /** E1-E3 + F1/F3 + D1/D2: impute -> stratified folds -> encodings.
    *
    * The continuous column's three scalar stats — mean (the imputation
    * fill), min and max (the scale01 bounds) — come from ONE aggregation
    * pass over `meta` instead of three: min/max ignore nulls and the mean
    * fill lies inside [min, max], so pre-impute bounds equal the bounds
    * scale01 would compute after imputation. Encodings are attached BEFORE
    * the fold window (they are independent per-row columns), so the stats
    * subquery never re-executes the window. Output columns and values are
    * bit-identical to the sequential impute→folds→encode composition
    * (pinned by ExperimentSpec and the q36 oracle); at scale this is one
    * corpus scan for scalar stats instead of three.
    */
  def prepare(meta: DataFrame, cfg: Config): DataFrame = {
    val a = cfg.ageCol
    // Scalar fills as LITERALS, via bounded one-row collects (r18).
    // Attached as broadcast cross-joins (the previous shape), the stats
    // and per-column mode subtrees are UN-PRUNABLE: a join may change the
    // row count, so Catalyst must execute them even when no downstream
    // column reads the imputed values — q36's finalized plan scanned
    // customer 14x while its output (per-fold BA/AUROC) never touches
    // age/gender, and the DuckDB twin prunes its `imp` CTE entirely. As
    // literals the fills constant-fold and the whole imputation
    // arithmetic prunes like any other unused projection; consumers that
    // DO read the imputed columns (ExperimentSpec) get bit-identical
    // values — same aggregates, same expressions, only the attachment
    // changed. The collects are 1-row aggregates (bounded by
    // construction) and run the same single metadata pass per scalar the
    // cross-join form executed anyway.
    val statsRow = meta.agg(avg(col(a)).cast("double").as("__mean"),
      min(col(a)).cast("double").as("__min"),
      max(col(a)).cast("double").as("__max")).head()
    def dlit(i: Int): Column =
      if (statsRow.isNullAt(i)) lit(null).cast("double")
      else lit(statsRow.getDouble(i))
    val (meanL, minL, maxL) = (dlit(0), dlit(1), dlit(2))
    val span = maxL - minL
    val scaled = meta
      .withColumn(a, coalesce(col(a), meanL))
      // same constant-column guard as Encode.scale01: span 0 scales to 0.0
      .withColumn(s"${a}_scaled",
        when(span > 0, (col(a) - minL) / span)
          .otherwise(when(col(a).isNotNull, lit(0.0))))
    // per-column mode fills, same reference tie semantics as
    // Impute.modeImpute (most frequent, ties toward the LOWEST value),
    // computed over the progressively-filled frame exactly as the fold
    // in modeImpute does; an all-null column mirrors modeImpute's
    // empty-cross-join result (zero rows)
    val imputed = cfg.catCols.foldLeft(scaled) { (d, c) =>
      val m = d.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
        .orderBy(col("__cnt").desc, col(c).asc)
        .limit(1).select(col(c)).collect()
      if (m.isEmpty) d.where(lit(false))
      else d.withColumn(c, coalesce(col(c), lit(m(0).get(0))))
    }
    val encoded = Encode.bucketize(imputed, a, Seq(30.0, 60.0), s"${a}_class")
    val folded = StratifiedFolds.assignSets(
      StratifiedFolds.assignRoundRobin(
        encoded, Seq(col(cfg.labelCol), col("lab")), cfg.nFolds, col(cfg.slideCol)),
      cfg.nVal, cfg.nTest)
    // restore the historical column order (…meta, fold, set, scaled, class)
    folded.select((meta.columns ++ Seq("fold", "set",
      s"${a}_scaled", s"${a}_class")).map(col): _*)
  }

  /** E4 + E5/E7: per-slide roll-up of tile scores, then slide-level balanced
    * accuracy and AUROC per (fold, set).
    *
    * `tileScores`: one row per scored tile `(slide_name, score1)`.
    * Returns `(fold, set, balanced_accuracy, auroc)`.
    */
  def evaluate(prepared: DataFrame, tileScores: DataFrame, cfg: Config): DataFrame = {
    val slides = SlideRollup.rollup1(
      tileScores.join(
        broadcast(prepared.select(col(cfg.slideCol), col(cfg.labelCol),
          col("fold"), col("set"))),
        Seq(cfg.slideCol)),
      col(cfg.slideCol), col("score1"), col(cfg.labelCol),
      threshold = cfg.rollupThreshold, carry = Seq("fold", "set"))
    // ONE pass over the scored slides: separate balancedAccuracyBy + aurocBy
    // calls each re-execute the whole upstream pipeline (scoring stage,
    // join, roll-up) — with a mapPartitions scorer in the DAG that doubled
    // q36's cost. evalSuite's threshold pred (score >= t) is exactly
    // rollup1's pred column, pinned by ExperimentSpec/the q36 oracle.
    Metrics.evalSuite(slides, col("label"), col("score"),
      threshold = cfg.rollupThreshold, groups = Seq("fold", "set"))
  }
}
