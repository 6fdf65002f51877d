package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def cnn = Seq(
    // key, cnn_pred, cnn_conf, cnn_score1
    (1, 1, 0.69, 0.69), // uncertain -> overridden
    (2, 1, 0.70, 0.70), // exactly at threshold: <= is INCLUSIVE -> overridden
    (3, 0, 0.71, 0.29), // certain -> kept
    (4, 0, 0.95, 0.05)  // certain -> kept
  ).toDF("k", "cnn_pred", "cnn_conf", "cnn_score1")

  private def rf = Seq(
    (1, 0, 0.10), (2, 0, 0.20), (3, 1, 0.90), (4, 1, 0.80)
  ).toDF("k", "rf_pred", "rf_score1")

  test("naive fusion overrides pred AND score when conf <= v (inclusive at 0.7)") {
    val out = Fusion.naive(cnn, rf, "k", 0.7).orderBy("k")
      .select("fused_pred", "fused_score1").as[(Int, Double)].collect()
    assert(out.toSeq == Seq((0, 0.10), (0, 0.20), (0, 0.29), (0, 0.05)))
  }

  test("v=0 keeps all CNN decisions except conf==0") {
    val out = Fusion.naive(cnn, rf, "k", 0.0).orderBy("k")
      .select("fused_pred").as[Int].collect()
    assert(out.toSeq == Seq(1, 1, 0, 0))
  }

  test("thresholdSweep counts uncertain and scores fused accuracy per threshold") {
    val labeled = cnn.join(rf, "k").withColumn("y", lit(0))
    val sweep = Fusion.thresholdSweep(labeled, Seq(0.5, 0.7, 1.0), col("y"))
      .orderBy("v").collect()
    // v=0.5: none uncertain; v=0.7: keys 1,2; v=1.0: all 4
    assert(sweep.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L))
    // y=0 for all; fused preds at v=0.7: [0,0,0,0] -> acc 1.0
    assert(math.abs(sweep(1).getDouble(2) - 1.0) < 1e-12)
    // at v=0.5 preds = cnn preds [1,1,0,0] -> acc 0.5
    assert(math.abs(sweep(0).getDouble(2) - 0.5) < 1e-12)
  }
}
