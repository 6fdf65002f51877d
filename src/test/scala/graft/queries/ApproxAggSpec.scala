package graft.queries

import graft.SparkSpec

class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("q14 sketch aggregates stay within their error bounds on real data") {
    val out = SparkEntry_q14(spark, "/root/testdata/sf0.001")
    assert(out.nonEmpty)
    out.foreach { case (flag, relErr) =>
      assert(relErr <= 0.05, s"HLL++ rsd=0.02 should hold ~2% error, $flag got $relErr")
    }
  }

  private def SparkEntry_q14(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SparkEntry.queries("q14_approx_agg")(s, d)
      .select("l_returnflag", "rel_err").as[(String, Double)].collect().toSeq
}
