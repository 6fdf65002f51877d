package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's three fusion-model architectures (`mymodels.py:14-131`)
  * as INFERENCE-TIME scoring surfaces over an injected CNN-feature vector
  * and an encoded patient-metadata vector:
  *
  *   - weighted (`FusionNet_importance`, mymodels.py:14-62): each channel
  *     (image, metadata) emits a probability logit and an importance
  *     logit; the fused score is the importance-softmax-weighted sum of
  *     the channel sigmoids.
  *   - SE (`FusionNet_SEMul`, mymodels.py:65-94): the metadata MLP output
  *     is squashed to a sigmoid gate and multiplied elementwise into the
  *     image features; one linear+sigmoid head reads the gated vector.
  *   - CAT (`FusionNet`, mymodels.py:97-131): image features and metadata
  *     features are concatenated into one linear 2-class head.
  *
  * Eval-mode semantics make every layer pure vector arithmetic: dropout is
  * identity, and BatchNorm1d is the affine `y = γ(x−μ)/√(σ²+ε) + β`, which
  * [[foldBatchNorm]] folds into the preceding Linear — so a trained
  * torch checkpoint maps onto [[Affine]] weights exactly. All column
  * builders generate LEFT-ASSOCIATIVE multiply-add chains in fixed index
  * order, so results are bit-reproducible and (for the ReLU/linear parts)
  * bit-identical to an oracle that writes the same chains — the basis of
  * the q5a/q5b/q5c/q5d full oracles. The transcendental tails (sigmoid /
  * importance-softmax) are engine-side only, pinned by FusionModelsSpec
  * goldens and per-row contract columns.
  *
  * Scale shape: scoring is a pure per-row projection over whatever table
  * carries the feature vectors — no shuffle, no UDF, whole-stage codegen
  * throughout (`element_at`/arithmetic/`greatest` only).
  */
object FusionModels {

  /** One eval-mode dense layer: `out_i = [relu] (b_i + Σ_j w_ij · in_j)`. */
  final case class Affine(w: Array[Array[Double]], b: Array[Double],
                          relu: Boolean) {
    require(w.nonEmpty && w.forall(_.length == w.head.length) &&
      b.length == w.length, "weight/bias shape mismatch")
    def outDim: Int = w.length
    def inDim: Int = w.head.length
  }

  /** Fold an eval-mode BatchNorm1d (γ, β, running μ, running σ², ε) into
    * the preceding Linear(w, b): BN(Wx + b) = W'x + b' with
    * `W'_ij = (γ_i/√(σ²_i+ε))·W_ij` and `b'_i = (b_i−μ_i)·γ_i/√(σ²_i+ε) + β_i`.
    * This is how a trained torch block (Linear→Dropout→BN→ReLU,
    * mymodels.py:26-34) becomes one [[Affine]].
    */
  def foldBatchNorm(w: Array[Array[Double]], b: Array[Double],
                    gamma: Array[Double], beta: Array[Double],
                    mean: Array[Double], variance: Array[Double],
                    eps: Double = 1e-5, relu: Boolean = true): Affine = {
    val scale = gamma.indices.map(i => gamma(i) / math.sqrt(variance(i) + eps))
    Affine(
      w.zipWithIndex.map { case (row, i) => row.map(_ * scale(i)) },
      b.indices.map(i => (b(i) - mean(i)) * scale(i) + beta(i)).toArray,
      relu)
  }

  // ---------------------------------------------------------------- columns

  /** `b + w_0·in_0 + w_1·in_1 + …` as a left-associative Column chain —
    * the same shape the generated oracle SQL writes, so the double
    * arithmetic is bit-identical across engines.
    */
  private def chain(b: Double, terms: Seq[Column]): Column =
    terms.foldLeft(lit(b): Column)(_ + _)

  /** Apply one [[Affine]] layer to scalar input columns. */
  def affineCols(in: Seq[Column], layer: Affine): Seq[Column] = {
    require(in.length == layer.inDim,
      s"layer expects ${layer.inDim} inputs, got ${in.length}")
    (0 until layer.outDim).map { i =>
      val s = chain(layer.b(i),
        in.zipWithIndex.map { case (c, j) => lit(layer.w(i)(j)) * c })
      if (layer.relu) greatest(lit(0.0), s) else s
    }
  }

  /** The shared metadata extractor (two folded Linear+BN+ReLU blocks). */
  def metaFeatures(meta: Seq[Column], l1: Affine, l2: Affine): Seq[Column] =
    affineCols(affineCols(meta, l1), l2)

  /** `b + Σ_i w_i · vec[i]` over an `ARRAY<FLOAT|DOUBLE>` column, as an
    * explicit per-element chain (`element_at` is 1-based). The chain form
    * (not a dot-product kernel) is deliberate: its summation order is the
    * SQL text's order on both engines, so exactness never depends on a
    * library's accumulation strategy.
    */
  def vecChain(vec: Column, w: Array[Double], b: Double): Column =
    chain(b, w.zipWithIndex.map { case (wi, i) =>
      lit(wi) * element_at(vec, i + 1).cast("double")
    })

  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  // ---------------------------------------------------------- architectures

  /** CAT (`FusionNet`): `logit_c = b_c + Wimg_c·img + Wmeta_c·metaFeat` —
    * the concat head split into its image and metadata halves (identical
    * arithmetic, no array concat needed). Returns (logit0, logit1);
    * prediction = `logit1 > logit0` (exact — no transcendentals anywhere).
    */
  def catLogits(img: Column, metaFeat: Seq[Column],
                wImg: Array[Array[Double]], wMeta: Array[Array[Double]],
                b: Array[Double]): Seq[Column] =
    (0 until 2).map { c =>
      metaFeat.zipWithIndex.foldLeft(vecChain(img, wImg(c), b(c))) {
        case (acc, (mf, j)) => acc + lit(wMeta(c)(j)) * mf
      }
    }

  /** Weighted (`FusionNet_importance`) channel readouts: image and
    * metadata each produce `(probability logit, importance logit)` — all
    * four exact linear forms. The transcendental mix lives in
    * [[weightedScore]].
    */
  def weightedChannels(img: Column, metaFeat: Seq[Column],
                       fcImg: Array[Array[Double]], bImg: Array[Double],
                       fcMeta: Array[Array[Double]], bMeta: Array[Double])
      : (Column, Column, Column, Column) = {
    def metaChain(row: Array[Double], b: Double): Column =
      chain(b, metaFeat.zipWithIndex.map { case (mf, j) => lit(row(j)) * mf })
    (vecChain(img, fcImg(0), bImg(0)), vecChain(img, fcImg(1), bImg(1)),
      metaChain(fcMeta(0), bMeta(0)), metaChain(fcMeta(1), bMeta(1)))
  }

  /** Weighted fused score (mymodels.py:50-62): importance softmax over the
    * two importance logits, times the two channel sigmoids, summed — a
    * convex combination of σ(lImg) and σ(lMeta).
    */
  def weightedScore(lImg: Column, iImg: Column,
                    lMeta: Column, iMeta: Column): Column = {
    val eI = exp(iImg); val eM = exp(iMeta)
    (eI / (eI + eM)) * sigmoid(lImg) + (eM / (eI + eM)) * sigmoid(lMeta)
  }

  /** SE (`FusionNet_SEMul`) pre-sigmoid head value:
    * `z = b + Σ_i w_i · img[i] · σ(metaFeat_i)` (gate dim == feature dim).
    * The fused score is `σ(z)`.
    */
  def seZ(img: Column, metaFeat: Seq[Column],
          wFc: Array[Double], bFc: Double): Column = {
    require(metaFeat.length == wFc.length, "SE gate dim must equal feature dim")
    chain(bFc, wFc.indices.map { i =>
      lit(wFc(i)) * element_at(img, i + 1).cast("double") * sigmoid(metaFeat(i))
    })
  }

  /** Exact bounds on [[seZ]] from gate ∈ (0,1):
    * `lo = b + Σ min(0, w_i·img[i])`, `hi = b + Σ max(0, w_i·img[i])` —
    * ReLU-free-of-transcendentals, so a DuckDB oracle replays them exactly
    * while `z` itself stays engine-side.
    */
  def seBounds(img: Column, wFc: Array[Double],
               bFc: Double): (Column, Column) = {
    def side(f: (Column, Column) => Column): Column =
      chain(bFc, wFc.indices.map { i =>
        f(lit(0.0), lit(wFc(i)) * element_at(img, i + 1).cast("double"))
      })
    (side(least(_, _)), side(greatest(_, _)))
  }

  // ------------------------------------------------------- fixture weights

  /** Deterministic dyadic fixture weights (multiples of 1/32): exact in
    * binary AND in decimal rendering, so the generated oracle SQL carries
    * the identical doubles. One tag per layer keeps layers independent;
    * the mixing constants are chosen so every meta-feature component and
    * channel readout is non-constant over the embeddings fixture (an
    * earlier /16 variant zeroed two of the three meta features through the
    * second ReLU, leaving the oracle pinning constants).
    */
  def fixW(tag: Int, i: Int, j: Int): Double =
    (((i * 37 + j * 23 + tag * 101) % 31) - 15) / 32.0
  def fixB(tag: Int, i: Int): Double = (((i * 19 + tag * 43) % 23) - 11) / 32.0

  /** Build a fixture [[Affine]] layer. */
  def fixAffine(tag: Int, outDim: Int, inDim: Int, relu: Boolean): Affine =
    Affine(
      Array.tabulate(outDim, inDim)((i, j) => fixW(tag, i, j)),
      Array.tabulate(outDim)(i => fixB(tag, i)), relu)

  /** The fixture model dimensions: meta_in=3, hidden=5, meta_out=3 (CAT /
    * weighted — mymodels.py defaults) over 64-dim image features (the
    * embeddings table); the SE gate needs meta_out == feature dim = 64
    * (mymodels.py:92's elementwise `img*meta`).
    */
  object Fixture {
    val ImgDim = 64
    val metaL1: Affine = fixAffine(tag = 1, outDim = 5, inDim = 3, relu = true)
    val metaL2: Affine = fixAffine(tag = 2, outDim = 3, inDim = 5, relu = true)
    // weighted: fc_img 2×64, fc_meta 2×3 (row 0 = probability, row 1 = importance)
    val fcImgW: Array[Array[Double]] =
      Array.tabulate(2, ImgDim)((i, j) => fixW(3, i, j))
    val fcImgB: Array[Double] = Array.tabulate(2)(i => fixB(3, i))
    val fcMetaW: Array[Array[Double]] = Array.tabulate(2, 3)((i, j) => fixW(4, i, j))
    val fcMetaB: Array[Double] = Array.tabulate(2)(i => fixB(4, i))
    // CAT: one 2×(64+3) head, split img/meta
    val catImgW: Array[Array[Double]] =
      Array.tabulate(2, ImgDim)((i, j) => fixW(5, i, j))
    val catMetaW: Array[Array[Double]] = Array.tabulate(2, 3)((i, j) => fixW(6, i, j))
    val catB: Array[Double] = Array.tabulate(2)(i => fixB(5, i))
    // SE: meta MLP 3→5→64, head 64→1
    val seL1: Affine = fixAffine(tag = 8, outDim = 5, inDim = 3, relu = true)
    val seL2: Affine = fixAffine(tag = 9, outDim = ImgDim, inDim = 5, relu = true)
    val seFcW: Array[Double] = Array.tabulate(ImgDim)(j => fixW(7, 0, j))
    val seFcB: Double = fixB(7, 0)
  }

  // ------------------------------------------------- pure-Scala evaluation

  /** Driver/executor-side evaluation of the same heads over plain arrays —
    * shared by the spec goldens and by scorer plugs (a `TileScorer`
    * implementation can apply any of these inside `scorePartition`).
    */
  object Head {
    def affine(layer: Affine, in: Array[Double]): Array[Double] =
      Array.tabulate(layer.outDim) { i =>
        var s = layer.b(i)
        var j = 0
        while (j < layer.inDim) { s += layer.w(i)(j) * in(j); j += 1 }
        if (layer.relu) math.max(0.0, s) else s
      }
    def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
    private def dotB(w: Array[Double], b: Double, v: Array[Double]): Double = {
      var s = b; var i = 0
      while (i < w.length) { s += w(i) * v(i); i += 1 }
      s
    }
    /** CAT fused 2-class logits. */
    def catLogits(img: Array[Double], meta: Array[Double]): Array[Double] = {
      val mf = affine(Fixture.metaL2, affine(Fixture.metaL1, meta))
      Array.tabulate(2)(c =>
        dotB(Fixture.catMetaW(c), dotB(Fixture.catImgW(c), Fixture.catB(c), img), mf))
    }
    /** Weighted fused score (the full transcendental mix). */
    def weightedScore(img: Array[Double], meta: Array[Double]): Double = {
      val mf = affine(Fixture.metaL2, affine(Fixture.metaL1, meta))
      val lImg = dotB(Fixture.fcImgW(0), Fixture.fcImgB(0), img)
      val iImg = dotB(Fixture.fcImgW(1), Fixture.fcImgB(1), img)
      val lMeta = dotB(Fixture.fcMetaW(0), Fixture.fcMetaB(0), mf)
      val iMeta = dotB(Fixture.fcMetaW(1), Fixture.fcMetaB(1), mf)
      val eI = math.exp(iImg); val eM = math.exp(iMeta)
      (eI / (eI + eM)) * sigmoid(lImg) + (eM / (eI + eM)) * sigmoid(lMeta)
    }
    /** SE fused score. */
    def seScore(img: Array[Double], meta: Array[Double]): Double = {
      val mf = affine(Fixture.seL2, affine(Fixture.seL1, meta))
      var z = Fixture.seFcB
      var i = 0
      while (i < Fixture.seFcW.length) {
        z += Fixture.seFcW(i) * img(i) * sigmoid(mf(i)); i += 1
      }
      sigmoid(z)
    }
  }
}
