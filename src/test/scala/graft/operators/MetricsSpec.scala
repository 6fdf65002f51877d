package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("balancedAccuracy matches hand computation (unbalanced classes)") {
    // y=[0,0,0,1], p=[0,1,1,1]: recall0=1/3, recall1=1 -> BA=2/3
    val df = Seq((0, 0), (0, 1), (0, 1), (1, 1)).toDF("y", "p")
    val ba = Metrics.balancedAccuracy(df, col("y"), col("p"))
      .as[Double].collect()(0)
    assert(math.abs(ba - 2.0 / 3.0) < 1e-12)
  }

  test("balancedAccuracy equals plain accuracy on class-balanced data (sklearn property)") {
    val df = spark.range(1000).select(
      (col("id") % 2).as("y"),
      when(col("id") % 5 === 0, lit(1) - col("id") % 2).otherwise(col("id") % 2).as("p"))
    val ba = Metrics.balancedAccuracy(df, col("y"), col("p")).as[Double].collect()(0)
    val acc = df.agg(avg(when(col("y") === col("p"), 1.0).otherwise(0.0)))
      .as[Double].collect()(0)
    assert(math.abs(ba - acc) < 1e-12)
  }

  test("auroc matches sklearn on a tied-score fixture (average-rank ties)") {
    // y=[1,1,0,0], s=[0.9,0.5,0.5,0.1]: sklearn roc_auc_score = 0.875
    val df = Seq((1, 0.9), (1, 0.5), (0, 0.5), (0, 0.1)).toDF("y", "s")
    val a = Metrics.auroc(df, col("y"), col("s")).as[Double].collect()(0)
    assert(math.abs(a - 0.875) < 1e-12)
  }

  test("auroc is 1.0 for perfect separation, 0.5 for constant scores") {
    val perfect = Seq((0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)).toDF("y", "s")
    assert(math.abs(Metrics.auroc(perfect, col("y"), col("s")).as[Double].collect()(0) - 1.0) < 1e-12)
    val const = Seq((0, 0.5), (1, 0.5), (0, 0.5), (1, 0.5)).toDF("y", "s")
    assert(math.abs(Metrics.auroc(const, col("y"), col("s")).as[Double].collect()(0) - 0.5) < 1e-12)
  }

  test("auroc is invariant under monotone score transforms") {
    val df = Seq((1, 0.9), (1, 0.4), (0, 0.6), (0, 0.1), (1, 0.6)).toDF("y", "s")
    val a = Metrics.auroc(df, col("y"), col("s")).as[Double].collect()(0)
    val b = Metrics.auroc(df.withColumn("s", col("s") * 100 + 7), col("y"), col("s"))
      .as[Double].collect()(0)
    assert(math.abs(a - b) < 1e-12)
  }

  test("ungrouped auroc on continuous (all-distinct) scores matches direct Mann-Whitney") {
    // all-distinct scores = the worst case the old single-partition window
    // choked on; the distributed prefix-sum must still rank globally
    val n = 500
    val data = (0 until n).map { i =>
      val s = ((i * 2654435761L) % 1000003L).toDouble
      val y = if ((i * 48271) % 97 < 48) 1 else 0
      (y, s)
    }
    val df = data.toDF("y", "s").repartition(7)
    val a = Metrics.auroc(df, col("y"), col("s")).as[Double].collect()(0)
    val ranked = data.sortBy(_._2).zipWithIndex
    val posRanks = ranked.collect { case ((1, _), r) => r + 1.0 }
    val nPos = posRanks.size; val nNeg = n - nPos
    val expected = (posRanks.sum - nPos * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
    assert(math.abs(a - expected) < 1e-9)
  }

  test("ungrouped auroc plan has no unpartitioned window over the score table") {
    val df = spark.range(1000).select((col("id") % 2).as("y"),
      ((col("id") * 37) % 997).cast("double").as("s"))
    val planStr = Metrics.auroc(df, col("y"), col("s"))
      .queryExecution.executedPlan.toString
    // the score-table cumsum must partition by __pid; only the tiny
    // per-partition-totals table may go through an unpartitioned window
    assert(!planStr.contains("windowspecdefinition(__s#"),
      s"found unpartitioned window directly over scores:\n$planStr")
  }

  test("single-class input yields NULL auroc (per group), not an ANSI divide error") {
    val allPos = Seq((1, 1.0), (1, 2.0)).toDF("y", "s")
    val r = Metrics.auroc(allPos, col("y"), col("s")).collect()(0)
    assert(r.isNullAt(0), "all-positive labels must give NULL auroc")
    // grouped: the degenerate group is NULL, the healthy group still computes
    val mixed = Seq(("a", 1, 1.0), ("a", 1, 2.0), ("b", 1, 2.0), ("b", 0, 1.0))
      .toDF("g", "y", "s")
    val byG = Metrics.aurocBy(mixed, col("y"), col("s"), Seq("g"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byG("a").isEmpty, "single-class group must be NULL")
    assert(byG("b").contains(1.0), s"healthy group must compute: ${byG("b")}")
  }

  test("meanStd uses POPULATION std (np.std ddof=0), not sample std") {
    // values 1,2,3,4: pop std = sqrt(1.25), sample std = sqrt(5/3)
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("m")
    val r = Metrics.meanStd(df, col("m")).collect()(0)
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(1.25)) < 1e-12)
  }

  test("recallByClass reports per-class recall and support") {
    val df = Seq((0, 0), (0, 1), (1, 1), (1, 1)).toDF("y", "p")
    val rows = Metrics.recallByClass(df, col("y"), col("p")).collect()
    assert(rows(0).getInt(0) == 0 && math.abs(rows(0).getDouble(1) - 0.5) < 1e-12 && rows(0).getLong(2) == 2)
    assert(rows(1).getInt(0) == 1 && math.abs(rows(1).getDouble(1) - 1.0) < 1e-12 && rows(1).getLong(2) == 2)
  }

  test("evalSuite == balancedAccuracyBy + aurocBy, bit-identically (grouped and global)") {
    // deterministic mixed data: integer scores with ties, both classes per
    // group, plus one degenerate all-positive group for the NULL path
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", i % 2, (i * 7 + i % 5) % 20)
    } ++ Seq(("gsolo", 1, 3), ("gsolo", 1, 9))
    val df = rows.toDF("g", "y", "sc")
    val thr = 10.0
    val suite = Metrics.evalSuite(df, col("y"), col("sc"), thr, Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
         (if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val ba = Metrics.balancedAccuracyBy(
        df.withColumn("p", when(col("sc") >= thr, 1).otherwise(0)),
        col("y"), col("p"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val au = Metrics.aurocBy(df, col("y"), col("sc").cast("long"), Seq("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(suite.keySet == ba.keySet)
    suite.foreach { case (g, (sba, sau)) =>
      assert(sba.contains(ba(g)), s"$g: suite BA $sba != ${ba(g)}")
      assert(sau == au(g), s"$g: suite AUROC $sau != ${au(g)}")
    }
    assert(suite("gsolo")._2.isEmpty, "single-class group AUROC must be NULL")
    // ungrouped path agrees with the grouped machinery's outputs too
    val one = Metrics.evalSuite(df.filter(col("g") === "g1"), col("y"),
      col("sc"), thr, Nil).collect()(0)
    assert(one.getDouble(0) == ba("g1") && one.getDouble(1) == au("g1").get)
  }

  test("evalSuite plans its input ONCE (linear DAG, no BA/AUROC branch join)") {
    // an expensive upstream (here a mapInPandas-style object boundary via
    // mapPartitions through the Dataset API) must appear exactly once in
    // the executed plan — the branched shape planned it twice and left AQE
    // stage reuse to decide whether it RAN twice
    val base = spark.range(1000).selectExpr("id % 4 AS g", "id % 100 AS sc",
      "CAST(id % 2 AS LONG) AS y")
    val ds = base.as[(Long, Long, Long)]
      .mapPartitions(it => it.map(identity))
      .toDF("g", "sc", "y")
    val plan = Metrics.evalSuite(ds, col("y"), col("sc"), 50.0, Seq("g"))
      .queryExecution.executedPlan.toString
    val scans = "MapPartitions".r.findAllIn(plan).length
    assert(scans == 1, s"input planned $scans times:\n$plan")
  }
}
