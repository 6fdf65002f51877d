package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numeric profile: exact counts, null counts, min/max in one pass") {
    val df = Seq(
      (Some(1.0), Some(10L)), (Some(2.5), None),
      (None, Some(30L)), (Some(-4.25), Some(20L)))
      .toDF("a", "b")
    val out = Profile.numeric(df, Seq("a", "b"))
      .select("col_name", "n", "n_null", "min_v", "max_v")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(out == Set(
      ("a", 3L, 1L, -4.25, 2.5),
      ("b", 3L, 1L, 10.0, 30.0)), s"got $out")
  }

  test("profile is ONE aggregate: a single scan feeds every metric") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    val plan = Profile.numeric(df, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    // one partial + one final aggregate, and no join/union of per-column scans
    assert(!plan.contains("Union"), s"per-column scans unioned:\n$plan")
  }
}
