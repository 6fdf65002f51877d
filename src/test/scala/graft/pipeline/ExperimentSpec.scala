package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  /** Two miniature lab cohorts with nulls to impute; labels balanced. */
  private def cohort(n: Int, offset: Int) = (0 until n).map { i =>
    val id = i + offset
    (s"s$id",
      i % 2,                                        // label
      if (i % 7 == 0) None else Some(30.0 + i % 40), // age with nulls
      if (i % 5 == 0) None else Some(i % 2),         // gender with nulls
      Some(i % 3))                                   // location
  }.toDF("slide_name", "label", "age", "gender", "location")

  /** Injected tile scores: 3 tiles per slide; even-label slides score high.
    * The pipeline should then separate classes almost perfectly.
    */
  private def tileScores(meta: org.apache.spark.sql.DataFrame) =
    meta.select("slide_name", "label")
      .withColumn("t", explode(array(lit(1), lit(2), lit(3))))
      .withColumn("score1",
        when(col("label") === 1, lit(0.8) + col("t") * 0.01)
          .otherwise(lit(0.2) - col("t") * 0.01))
      .select("slide_name", "score1")

  test("ingest unions cohorts with lab tags (A2/G1)") {
    val m = Experiment.ingest(Seq(cohort(10, 0), cohort(8, 100)))
    assert(m.count() == 18)
    assert(m.groupBy("lab").count().as[(Int, Long)].collect().toMap ==
      Map(0 -> 10L, 1 -> 8L))
  }

  test("prepare leaves no nulls, assigns folds/sets, adds encodings") {
    val prepared = Experiment.prepare(
      Experiment.ingest(Seq(cohort(40, 0), cohort(40, 100))),
      Experiment.Config())
    assert(prepared.filter(col("age").isNull || col("gender").isNull).count() == 0)
    assert(prepared.select("fold").distinct().count() == 5)
    assert(prepared.select("set").distinct().as[String].collect().toSet ==
      Set("train", "val", "test"))
    assert(prepared.columns.contains("age_scaled") && prepared.columns.contains("age_class"))
    // stratification balance: each fold carries both labels
    val perFold = prepared.groupBy("fold", "label").count().count()
    assert(perFold == 10, "5 folds x 2 labels must all be populated")
  }

  test("evaluate: separable injected scores give BA and AUROC ~ 1 per (fold,set)") {
    val meta = Experiment.ingest(Seq(cohort(40, 0), cohort(40, 100)))
    val prepared = Experiment.prepare(meta, Experiment.Config())
    val out = Experiment.evaluate(prepared, tileScores(meta), Experiment.Config())
      .select("fold", "set", "balanced_accuracy", "auroc")
      .as[(Int, String, Double, Double)].collect()
    // D2 maps each fold to exactly one set (functions_v2.py:104-117):
    // nVal=1 -> fold 0 val, nTest=2 -> folds 1-2 test, rest train
    assert(out.map(r => (r._1, r._2)).sorted.toSeq ==
      Seq((0, "val"), (1, "test"), (2, "test"), (3, "train"), (4, "train")))
    out.foreach { case (f, st, ba, au) =>
      assert(ba == 1.0 && au == 1.0, s"fold $f $st: ba=$ba auroc=$au")
    }
  }
}
