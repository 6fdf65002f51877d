package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A7: YAML config ingestion (reference `run_experiments.py:11-17` glob
  * loop, `main.py:10-56` hparam parse) — parse round-trip, loud failures
  * outside the subset, and H6 launched from a config FILE producing the
  * same report as the in-code config.
  */
class ConfigIOSpec extends SparkSpec {
  import spark.implicits._

  private val yamlText =
    """# experiment hyperparameters
      |n_folds: 5
      |n_val: 1
      |n_test: 2            # two held-out test folds
      |age_col: age
      |cat_cols: [gender, location]
      |label_col: "label"
      |slide_col: slide_name
      |rollup_threshold: 0.5
      |fusion_threshold: 0.7
      |""".stripMargin

  test("parseConfig round-trips every Experiment.Config field") {
    val cfg = ConfigIO.parseConfig(yamlText)
    assert(cfg == Experiment.Config())
    // non-default values land too, and block lists parse like inline ones
    val cfg2 = ConfigIO.parseConfig(
      """n_folds: 3
        |rollup_threshold: 0.25
        |cat_cols:
        |  - gender
        |""".stripMargin)
    assert(cfg2.nFolds == 3 && cfg2.rollupThreshold == 0.25 &&
      cfg2.catCols == Seq("gender"))
  }

  test("unknown keys and out-of-subset YAML fail loudly") {
    val typo = intercept[IllegalArgumentException] {
      ConfigIO.parseConfig("n_fodls: 5")
    }
    assert(typo.getMessage.contains("n_fodls"))
    assertThrows[RuntimeException] {
      ConfigIO.parseConfig("- item without key")
    }
    assertThrows[RuntimeException] {
      ConfigIO.parseConfig("just a bare line")
    }
  }

  test("typed scalars: ints, doubles, quoted strings, comments in values") {
    val m = ConfigIO.parseYamlMap(
      "a: 42\nb: 4.5\nc: 'x # not a comment'\nd: plain # comment\ne: [1, 2]")
    assert(m("a") == 42L && m("b") == 4.5 && m("c") == "x # not a comment" &&
      m("d") == "plain" && m("e") == Vector(1L, 2L))
  }

  private def cohort(n: Int, offset: Int) = (0 until n).map { i =>
    val id = i + offset
    (s"s$id", i % 2,
      if (i % 7 == 0) None else Some(30.0 + i % 40),
      if (i % 5 == 0) None else Some(i % 2),
      Some(i % 3))
  }.toDF("slide_name", "label", "age", "gender", "location")

  test("H6 launched from a config file == H6 from the in-code config") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfgs")
    java.nio.file.Files.writeString(dir.resolve("exp_a.yaml"), yamlText)
    java.nio.file.Files.writeString(dir.resolve("exp_b.yaml"),
      "n_folds: 4\nn_val: 1\nn_test: 1\n")
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "ignored")
    val configs = ConfigIO.loadConfigs(dir.toString)
    assert(configs.map(_._1) == Seq("exp_a", "exp_b"))

    val meta = Experiment.ingest(Seq(cohort(40, 0), cohort(40, 100)))
    val scores = meta.select("slide_name", "label")
      .withColumn("t", explode(array(lit(1), lit(2), lit(3))))
      .withColumn("score1",
        when(col("label") === 1, lit(0.8) + col("t") * 0.01)
          .otherwise(lit(0.2) - col("t") * 0.01))
      .select("slide_name", "score1")

    val all = ConfigIO.runAll(meta, scores, configs)
      .select("experiment", "fold", "set", "balanced_accuracy", "auroc")
      .as[(String, Int, String, Double, Double)].collect()
    // exp_a is the default config: same 5-fold report ExperimentSpec pins
    val expA = all.filter(_._1 == "exp_a").map(r => (r._2, r._3)).sorted.toSeq
    assert(expA == Seq((0, "val"), (1, "test"), (2, "test"), (3, "train"), (4, "train")))
    // exp_b overrides fold geometry: 4 folds, 1 val + 1 test + 2 train
    val expB = all.filter(_._1 == "exp_b").map(r => (r._2, r._3)).sorted.toSeq
    assert(expB == Seq((0, "val"), (1, "test"), (2, "train"), (3, "train")))
    all.foreach { case (e, f, st, ba, au) =>
      assert(ba == 1.0 && au == 1.0, s"$e fold $f $st: ba=$ba auroc=$au")
    }
  }
}
