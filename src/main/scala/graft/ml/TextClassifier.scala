package graft.ml

import graft.functions.TextFunctions
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style linear text classifier for corpus filtering: a logistic
  * regression over hashed bag-of-tokens counts — the public architecture
  * behind learned language-ID / quality filters in large-scale pipeline
  * curation (a linear model over hashed n-gram features), here over
  * unigram buckets.
  *
  * Verification discipline (the q34 / MetaClassifier pattern): the FIT is
  * engine-specific (Spark ML), but the fitted model's decision function is
  * pure linear arithmetic, exported as the SAME left-associative
  * multiply-add chain in Column form ([[marginCol]]) and SQL form
  * ([[marginSql]]) — bit-identical across engines — and the features are
  * ENGINE-PORTABLE by construction: token bucket = (md5-60-bit value of
  * the token) mod k, the cross-engine hash the SimHash oracle (q47)
  * already proves both engines compute identically. So an oracle replays
  * feature extraction AND scoring exactly; only training stays Spark-side.
  *
  * Scale shape: scoring is a per-row projection (tokenize once, bucket
  * via a lambda transform, k bounded-size count columns) — no shuffle, no
  * UDF. Fit input is coalesced to one partition so the gradient
  * aggregation order is deterministic (refits in the same session must
  * produce bit-identical coefficients for the dynamic oracle); training
  * data for a quality model is sampled/small by construction.
  */
object TextClassifier {

  /** Appends `f0..f{k-1}` token-count feature columns (doubles — the
    * values are exact small integers; double keeps the downstream chain
    * arithmetic identical on both engines).
    */
  def hashedFeatures(df: DataFrame, text: String, k: Int): DataFrame = {
    require(k > 0, s"need k > 0 feature buckets, got $k")
    // engine-portable token bucket: first 15 md5 hex chars as a 60-bit
    // integer, mod k (DuckDB: CAST('0x' || substr(md5(t),1,15) AS BIGINT))
    val bucket = transform(TextFunctions.tokens(col(text)),
      t => pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"),
        lit(k.toLong)))
    df.withColumn("__bk", bucket)
      .select(col("*") +: (0 until k).map(j =>
        size(filter(col("__bk"), b => b === j)).cast("double").as(s"f$j")): _*)
      .drop("__bk")
  }

  /** Fit a binary logistic regression on `train`'s hashed features. The
    * small ridge term keeps the optimum unique (hash-separable training
    * sets would otherwise let weights run off), and maxIter bounds LBFGS.
    */
  def fit(train: DataFrame, text: String, labelCol: String,
          k: Int = 64, regParam: Double = 0.01,
          maxIter: Int = 50): LogisticRegressionModel = {
    val feats = hashedFeatures(train, text, k)
      .select((col(labelCol) +: (0 until k).map(j => col(s"f$j"))): _*)
      .coalesce(1) // deterministic gradient aggregation order
    val assembled = new VectorAssembler()
      .setInputCols((0 until k).map(j => s"f$j").toArray)
      .setOutputCol("features")
      .transform(feats)
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter)
      .fit(assembled)
  }

  /** The decision margin (log-odds) as a left-associative Column chain
    * over the `f*` columns — `pred = margin >= 0` is the exact-arithmetic
    * form of `sigmoid(margin) >= 0.5`.
    */
  def marginCol(model: LogisticRegressionModel): Column = {
    val c = model.coefficients.toArray
    c.indices.foldLeft(lit(model.intercept): Column) { (acc, j) =>
      acc + lit(c(j)) * col(s"f$j")
    }
  }

  /** The SQL twin of [[marginCol]]: identical chain, shortest-repr double
    * literals forced into scientific notation — DuckDB parses a PLAIN
    * decimal literal as DECIMAL and converts (a double-rounding, measured
    * 1-ulp drift on 17-digit learned coefficients), while a scientific-
    * notation literal parses directly as an IEEE double. The fixture-weight
    * oracles (q5a/q5h) never hit this because their weights are dyadic.
    */
  def marginSql(model: LogisticRegressionModel): String = {
    def dlit(x: Double): String = {
      val s = x.toString
      if (s.contains("E") || s.contains("e")) s else s + "e0"
    }
    val c = model.coefficients.toArray
    c.indices.foldLeft(dlit(model.intercept)) { (acc, j) =>
      s"$acc + ${dlit(c(j))}*f$j"
    }
  }

  /** Score `df`: adds `margin` (exact chain) and `pred` (margin >= 0). */
  def score(model: LogisticRegressionModel, df: DataFrame, text: String,
            k: Int): DataFrame =
    hashedFeatures(df, text, k)
      .withColumn("margin", marginCol(model))
      .withColumn("pred", (col("margin") >= 0).cast("int"))
}
