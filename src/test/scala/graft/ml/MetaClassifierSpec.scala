package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetaClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Separable synthetic metadata: label = 1 iff age > 50; `noise` is an
    * uninformative column. 200 rows, balanced.
    */
  private def meta = (0 until 200).map { i =>
    val age = if (i % 2 == 0) 30.0 + (i % 20) else 55.0 + (i % 20)
    (i.toLong, age, (i % 7).toDouble, if (age > 50) 1.0 else 0.0)
  }.toDF("id", "age", "noise", "label")

  test("RF learns a separable rule; BA near 1 on train data") {
    val m = MetaClassifier.fit(meta, Seq("age", "noise"), "label",
      MetaClassifier.Config(numTrees = 21, maxDepth = 3))
    val ba = MetaClassifier.balancedAccuracy(m, meta, Seq("age", "noise"), "label")
    assert(ba > 0.95, s"BA=$ba")
  }

  test("score exposes P(class 1) consistent with prediction") {
    val m = MetaClassifier.fit(meta, Seq("age", "noise"), "label",
      MetaClassifier.Config(numTrees = 21, maxDepth = 3))
    val bad = MetaClassifier.score(m, meta, Seq("age", "noise"))
      .filter((col("score1") >= 0.5) =!= (col("prediction") === 1.0))
      .count()
    assert(bad == 0, "score1>=0.5 must agree with the predicted class")
  }

  test("fit is deterministic under a fixed seed") {
    val cfg = MetaClassifier.Config(numTrees = 11, maxDepth = 4, seed = 7L)
    val p1 = MetaClassifier.score(
      MetaClassifier.fit(meta, Seq("age", "noise"), "label", cfg),
      meta, Seq("age", "noise")).select("id", "score1").as[(Long, Double)].collect().toMap
    val p2 = MetaClassifier.score(
      MetaClassifier.fit(meta, Seq("age", "noise"), "label", cfg),
      meta, Seq("age", "noise")).select("id", "score1").as[(Long, Double)].collect().toMap
    assert(p1 == p2)
  }

  test("model persists and reloads with identical predictions (A6 artifact store)") {
    val m = MetaClassifier.fit(meta, Seq("age", "noise"), "label",
      MetaClassifier.Config(numTrees = 11, maxDepth = 3, seed = 3L))
    val path = java.nio.file.Paths.get("target", "tmp", "rf_model").toAbsolutePath.toString
    m.write.overwrite().save(path)
    val reloaded = org.apache.spark.ml.classification
      .RandomForestClassificationModel.load(path)
    val before = MetaClassifier.score(m, meta, Seq("age", "noise"))
      .select("id", "score1").as[(Long, Double)].collect().toMap
    val after = MetaClassifier.score(reloaded, meta, Seq("age", "noise"))
      .select("id", "score1").as[(Long, Double)].collect().toMap
    assert(before == after)
  }

  test("gridSearch picks a config achieving the best val BA") {
    val train = meta.filter(col("id") % 3 =!= 0)
    val valDf = meta.filter(col("id") % 3 === 0)
    val (cfg, ba) = MetaClassifier.gridSearch(train, valDf,
      Seq("age", "noise"), "label",
      numTreesGrid = Seq(1, 21), maxDepthGrid = Seq(1, 3))
    assert(ba > 0.9, s"best grid BA=$ba with $cfg")
  }

  test("forestSql replays MLlib scoring bit-for-bit (prediction AND score1)") {
    // the q34 oracle's foundation: the exported CASE expressions must
    // reproduce model.transform EXACTLY — evaluated here through Spark's
    // own SQL engine on rows the trees actually split on
    val m = MetaClassifier.fit(meta, Seq("age", "noise"), "label",
      MetaClassifier.Config(numTrees = 21, maxDepth = 5))
    val f = MetaClassifier.forestSql(m, Seq("age", "noise"))
    val viaModel = MetaClassifier.score(m, meta, Seq("age", "noise"))
      .select(col("id"), col("prediction").cast("int").as("p"), col("score1"))
    val viaSql = meta.selectExpr("id", s"${f.pred} AS p2", s"${f.score1} AS s2")
    val joined = viaModel.join(viaSql, "id")
    assert(joined.filter(col("p") =!= col("p2")).count() == 0,
      "exported predictions must match the model")
    // BIT equality on the probability, not approximate
    assert(joined.filter(col("score1") =!= col("s2")).count() == 0,
      "exported score1 must match probability[1] bit-for-bit")
  }

  test("perFoldEval returns one row per fold with val/test BA") {
    val folded = meta
      .withColumn("fold", (col("id") % 2).cast("int"))
      .withColumn("set",
        when(col("id") % 5 === 0, "val")
          .when(col("id") % 5 === 1, "test").otherwise("train"))
    val out = MetaClassifier.perFoldEval(folded, Seq("age", "noise"), "label",
      folds = Seq(0, 1), MetaClassifier.Config(numTrees = 11, maxDepth = 3))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0, 1))
    assert(out.forall(r => r._2 > 0.8 && r._3 > 0.8), s"got ${out.toSeq}")
  }
}
