package graft.ml

import graft.SparkSpec
import graft.ml.FusionModels.{Affine, Fixture, Head}
import graft.pipeline.{Tile, TileScore, TileScorer}
import org.apache.spark.sql.functions._

/** The fusion scoring surfaces (reference mymodels.py:14-131): golden
  * values for the transcendental tails the q5a-q5d oracles cannot hash
  * (importance-softmax mix, SE gate), the BatchNorm fold law that maps a
  * trained torch block onto [[Affine]], bit-agreement between the Column
  * builders and the pure-Scala [[Head]], and TileScorer pluggability.
  */
class FusionModelsSpec extends SparkSpec {
  import spark.implicits._

  private val img: Array[Double] =
    Array.fill(32)(-0.25) ++ Array.fill(32)(0.5)
  private val meta: Array[Double] = Array(0.875, 0.5, 7.0)

  test("golden: CAT logits, weighted channels + score, SE score (independently computed)") {
    // computed OUTSIDE the engine (python/math) from the same dyadic
    // fixture weights — pins the weight generator AND the head arithmetic
    val cat = Head.catLogits(img, meta)
    assert(cat(0) == -0.7918701171875 && cat(1) == -0.6103515625,
      s"cat logits drifted: ${cat.toSeq}")
    assert(math.abs(Head.weightedScore(img, meta) - 0.5217601463052197) < 1e-15)
    assert(math.abs(Head.seScore(img, meta) - 0.428954985150229) < 1e-15)
  }

  test("golden: meta MLP features (exact dyadic arithmetic)") {
    val mf = Head.affine(Fixture.metaL2, Head.affine(Fixture.metaL1, meta))
    assert(mf.toSeq == Seq(0.0, 0.318359375, 1.06640625), s"got ${mf.toSeq}")
  }

  test("foldBatchNorm: Linear->BN(eval) == folded Affine, on arbitrary inputs") {
    val w = Array(Array(0.5, -1.25), Array(2.0, 0.75))
    val b = Array(0.25, -0.5)
    val gamma = Array(1.5, 0.8); val beta = Array(-0.1, 0.2)
    val mean = Array(0.3, -0.7); val variance = Array(4.0, 0.25)
    val eps = 1e-5
    val folded = FusionModels.foldBatchNorm(w, b, gamma, beta, mean, variance, eps, relu = false)
    for (x <- Seq(Array(0.0, 0.0), Array(1.0, -2.0), Array(-3.5, 0.25))) {
      val lin = Array(b(0) + w(0)(0) * x(0) + w(0)(1) * x(1),
        b(1) + w(1)(0) * x(0) + w(1)(1) * x(1))
      val bn = Array.tabulate(2)(i =>
        gamma(i) * (lin(i) - mean(i)) / math.sqrt(variance(i) + eps) + beta(i))
      val got = Head.affine(folded, x)
      assert(math.abs(got(0) - bn(0)) < 1e-12 && math.abs(got(1) - bn(1)) < 1e-12,
        s"fold law broken on ${x.toSeq}: ${got.toSeq} vs ${bn.toSeq}")
    }
  }

  test("Column builders agree bit-for-bit with the pure-Scala head") {
    val df = Seq((1L, img.map(_.toFloat), meta(0), meta(1), meta(2)))
      .toDF("id", "emb", "m0", "m1", "m2")
    val mfCols = FusionModels.metaFeatures(
      Seq(col("m0"), col("m1"), col("m2")), Fixture.metaL1, Fixture.metaL2)
    val logits = FusionModels.catLogits(col("emb"), mfCols,
      Fixture.catImgW, Fixture.catMetaW, Fixture.catB)
    val (li, ii, lm, im) = FusionModels.weightedChannels(col("emb"), mfCols,
      Fixture.fcImgW, Fixture.fcImgB, Fixture.fcMetaW, Fixture.fcMetaB)
    val ws = FusionModels.weightedScore(li, ii, lm, im)
    // SE over its own MLP geometry
    val seMf = FusionModels.metaFeatures(
      Seq(col("m0"), col("m1"), col("m2")), Fixture.seL1, Fixture.seL2)
    val sez = FusionModels.seZ(col("emb"), seMf, Fixture.seFcW, Fixture.seFcB)
    val row = df.select(logits(0), logits(1), ws,
      FusionModels.sigmoid(sez)).head()
    val cat = Head.catLogits(img, meta)
    // exact linear parts: BIT equality; transcendental parts: the Column
    // path and Head must agree to the last ulp-ish (same Math.exp on the
    // same JVM — allow 1e-15 for expression-order differences)
    assert(row.getDouble(0) == cat(0) && row.getDouble(1) == cat(1),
      s"column CAT logits != head: $row vs ${cat.toSeq}")
    assert(math.abs(row.getDouble(2) - Head.weightedScore(img, meta)) < 1e-15)
    assert(math.abs(row.getDouble(3) - Head.seScore(img, meta)) < 1e-15)
  }

  test("weighted score is a convex combination of the channel sigmoids") {
    val df = Seq((img.map(_.toFloat), meta(0), meta(1), meta(2)))
      .toDF("emb", "m0", "m1", "m2")
    val mfCols = FusionModels.metaFeatures(
      Seq(col("m0"), col("m1"), col("m2")), Fixture.metaL1, Fixture.metaL2)
    val (li, ii, lm, im) = FusionModels.weightedChannels(col("emb"), mfCols,
      Fixture.fcImgW, Fixture.fcImgB, Fixture.fcMetaW, Fixture.fcMetaB)
    val r = df.select(FusionModels.weightedScore(li, ii, lm, im).as("s"),
      FusionModels.sigmoid(li).as("pi"), FusionModels.sigmoid(lm).as("pm")).head()
    val (s, pi, pm) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(s >= math.min(pi, pm) - 1e-15 && s <= math.max(pi, pm) + 1e-15,
      s"score $s outside [$pi, $pm]")
  }

  test("fusion heads plug into the TileScorer boundary") {
    // a scorer that derives (imgFeatures, meta) deterministically from the
    // payload and applies the REAL weighted fusion head — same batch
    // mechanics as production inference (per-partition init, streaming)
    object WeightedFusionScorer extends TileScorer {
      override def scorePartition(tiles: Iterator[Tile]): Iterator[TileScore] =
        tiles.map { t =>
          val f = Array.tabulate(Fixture.ImgDim)(i =>
            ((t.payload((i % t.payload.length)) & 0xff) - 128) / 256.0)
          val m = Array((t.payload(0) & 7) / 8.0, (t.payload(1) & 3) / 8.0,
            (t.payload(2) & 7).toDouble)
          TileScore(t.slide_name, Head.weightedScore(f, m))
        }
    }
    val tiles = Seq(
      Tile("s1", 0, 0, Array.tabulate(16)(i => (i * 37).toByte)),
      Tile("s2", 1, 2, Array.tabulate(16)(i => (i * 91 + 3).toByte))).toDS()
    val out = TileScorer.score(tiles, WeightedFusionScorer)
      .as[(String, Double)].collect().toMap
    assert(out.keySet == Set("s1", "s2"))
    assert(out.values.forall(s => s > 0.0 && s < 1.0), s"scores: $out")
  }
}
