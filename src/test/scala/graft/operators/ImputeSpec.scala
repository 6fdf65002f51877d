package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  test("meanImpute fills nulls with the non-null mean and preserves non-nulls") {
    val df = Seq[(Int, Option[Double])](
      (1, Some(10.0)), (2, None), (3, Some(20.0)), (4, None), (5, Some(30.0))
    ).toDF("id", "age")
    val out = Impute.meanImpute(df, Seq("age")).orderBy("id")
      .select("age").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 20.0, 20.0, 20.0, 30.0))
  }

  test("meanImpute leaves no nulls when at least one value is present") {
    for (n <- Seq(2, 7, 50)) {
      val df = spark.range(n).select(
        col("id"),
        when(col("id") % 3 === 0, lit(null)).otherwise(col("id") * 1.5).as("v"))
      val filled = Impute.meanImpute(df, Seq("v"))
      assert(filled.filter(col("v").isNull).count() == 0)
    }
  }

  test("meanImpute on an all-null column keeps nulls (no mean exists)") {
    val df = spark.range(3).select(col("id"), lit(null).cast("double").as("v"))
    assert(Impute.meanImpute(df, Seq("v")).filter(col("v").isNull).count() == 3)
  }

  test("modeImpute picks most frequent; tie broken toward LOWEST value (np.argmax)") {
    // values: 2 appears twice, 1 appears twice -> tie -> pick 1
    val df = Seq[(Int, Option[Int])](
      (1, Some(2)), (2, Some(2)), (3, Some(1)), (4, Some(1)), (5, None)
    ).toDF("id", "g")
    val out = Impute.modeImpute(df, Seq("g")).orderBy("id")
      .select("g").as[Int].collect()
    assert(out.toSeq == Seq(2, 2, 1, 1, 1))
  }

  test("nullAudit counts nulls per column") {
    val df = Seq[(Option[Int], Option[Int])](
      (Some(1), None), (None, None), (Some(3), Some(3))
    ).toDF("a", "b")
    val row = Impute.nullAudit(df, Seq("a", "b")).collect()(0)
    assert(row.getLong(0) == 1 && row.getLong(1) == 2)
  }
}
