package graft.queries

import graft.SparkSpec

class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("q14 sketch contracts hold on real data") {
    val out = SparkEntry_q14(spark, "/root/testdata/sf0.001")
    assert(out.nonEmpty)
    out.foreach { case (flag, hllOk, mono, p25Ok, p75Ok) =>
      assert(hllOk, s"default-rsd HLL outside 3-sigma for $flag")
      assert(mono, s"approx percentiles not monotone for $flag")
      assert(p25Ok && p75Ok, s"approx p25/p75 outside exact window for $flag")
    }
  }

  private def SparkEntry_q14(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SparkEntry.queries("q14_approx_agg")(s, d)
      .select("l_returnflag", "hll_default_ok", "p_monotone", "p25_ok", "p75_ok")
      .as[(String, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
}
