package graft.queries

import graft.Tables
import graft.ml.FusionModels
import graft.ml.FusionModels.Fixture
import graft.operators.Fusion
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three fusion-model scoring surfaces (reference `mymodels.py:14-131`)
  * as oracle-backed queries over the embeddings table (the injected
  * CNN-feature vectors) plus a deterministic encoded-metadata vector.
  *
  * Oracle strategy: every linear/ReLU readout is EXACT cross-engine — the
  * fixture weights are dyadic rationals (k/16, exact in decimal and in
  * binary) and both engines evaluate the same left-associative multiply-add
  * chains, so the DuckDB oracle hash-matches raw doubles with no rounding.
  * The transcendental tails (channel sigmoids, importance softmax, SE
  * gate) stay engine-side: where they decide something sign-expressible
  * the oracle pins the exact equivalent (σ(l) ≥ ½ ⟺ l ≥ 0), and the fused
  * scalar itself is pinned by per-row CONTRACT columns (oracle writes the
  * invariant, Spark writes the measured truth — any violation breaks the
  * hash) plus FusionModelsSpec goldens.
  *
  * The oracle SQL is GENERATED from the same Scala weight fixtures that
  * build the Spark plans, so the two sides cannot drift.
  */
object FusionQueries {

  // ------------------------------------------------------------ SQL pieces

  /** Exact decimal rendering of the dyadic fixture weights. */
  private def d2s(x: Double): String = x.toString

  /** `b + w0*in0 + w1*in1 + …` — the SQL twin of FusionModels.chain. */
  private def chainSql(b: Double, terms: Seq[String]): String =
    terms.foldLeft(d2s(b))((acc, t) => s"$acc + $t")

  private def affineSql(layer: FusionModels.Affine,
                        in: Seq[String]): Seq[String] =
    (0 until layer.outDim).map { i =>
      val s = chainSql(layer.b(i),
        in.zipWithIndex.map { case (e, j) => s"${d2s(layer.w(i)(j))}*$e" })
      if (layer.relu) s"greatest(0.0, $s)" else s
    }

  /** `b + w0*CAST(emb[1] AS DOUBLE) + …` — the SQL twin of vecChain. */
  private def vecChainSql(w: Array[Double], b: Double): String =
    chainSql(b, w.zipWithIndex.map { case (wi, i) =>
      s"${d2s(wi)}*CAST(emb[${i + 1}] AS DOUBLE)"
    })

  /** Shared WITH prefix: embeddings + the encoded metadata vector. */
  private val eStage =
    """e AS (SELECT vec_id, embedding AS emb, label,
      |  CAST(vec_id % 7 AS DOUBLE)/8.0 AS m0,
      |  CAST(vec_id % 5 AS DOUBLE)/8.0 AS m1,
      |  CAST(label AS DOUBLE) AS m2 FROM embeddings)""".stripMargin

  /** meta MLP stages (CAT/weighted geometry: 3→5→3). */
  private def metaStages: String = {
    val h = affineSql(Fixture.metaL1, Seq("m0", "m1", "m2"))
      .zipWithIndex.map { case (e, i) => s"$e AS h$i" }.mkString(",\n  ")
    val f = affineSql(Fixture.metaL2, (0 until 5).map(i => s"h$i"))
      .zipWithIndex.map { case (e, i) => s"$e AS mf$i" }.mkString(",\n  ")
    s"""h AS (SELECT *, $h FROM e),
       |f AS (SELECT *, $f FROM h)""".stripMargin
  }

  private def catLogitSql(c: Int): String =
    (0 until 3).foldLeft(vecChainSql(Fixture.catImgW(c), Fixture.catB(c))) {
      (acc, j) => s"$acc + ${d2s(Fixture.catMetaW(c)(j))}*mf$j"
    }

  // -------------------------------------------------------- Spark builders

  /** embeddings + encoded metadata (the Spark twin of eStage). */
  private def eFrame(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("embedding").as("emb"), col("label"),
      ((col("vec_id") % 7).cast("double") / lit(8.0)).as("m0"),
      ((col("vec_id") % 5).cast("double") / lit(8.0)).as("m1"),
      col("label").cast("double").as("m2"))

  /** Attach mf0..mf2 via the staged meta MLP (mirrors h/f stages). */
  private def withMetaFeatures(e: DataFrame): DataFrame = {
    val h = FusionModels.affineCols(
      Seq(col("m0"), col("m1"), col("m2")), Fixture.metaL1)
    val withH = e.select(
      e.columns.map(col) ++ h.zipWithIndex.map { case (c, i) => c.as(s"h$i") }: _*)
    val f = FusionModels.affineCols((0 until 5).map(i => col(s"h$i")), Fixture.metaL2)
    withH.select(
      withH.columns.map(col) ++ f.zipWithIndex.map { case (c, i) => c.as(s"mf$i") }: _*)
  }

  private def mfCols: Seq[Column] = (0 until 3).map(i => col(s"mf$i"))

  // --------------------------------------------------------------- queries

  def defs: Seq[QueryDef] = Seq(

    // ---- CAT fusion (FusionNet, mymodels.py:97-131): concat head over
    //      image features + metadata features. Everything is linear/ReLU,
    //      so the FULL surface — meta features, both logits, and the
    //      prediction — is exact cross-engine. ----------------------------
    QueryDef.sql("q5a_fusion_cat",
      s"""WITH $eStage,
         |$metaStages
         |SELECT vec_id, mf0, mf1, mf2,
         |  ${catLogitSql(0)} AS logit0,
         |  ${catLogitSql(1)} AS logit1,
         |  CASE WHEN logit1 > logit0 THEN 1 ELSE 0 END AS pred
         |FROM f ORDER BY vec_id""".stripMargin) { (s, d) =>
      val f = withMetaFeatures(eFrame(s, d))
      val logits = FusionModels.catLogits(col("emb"), mfCols,
        Fixture.catImgW, Fixture.catMetaW, Fixture.catB)
      f.select(col("vec_id"), col("mf0"), col("mf1"), col("mf2"),
          logits(0).as("logit0"), logits(1).as("logit1"))
        .withColumn("pred",
          when(col("logit1") > col("logit0"), 1).otherwise(0))
        .orderBy(col("vec_id"))
    },

    // ---- weighted fusion (FusionNet_importance, mymodels.py:14-62): the
    //      four channel readouts (probability + importance logit per
    //      channel) are exact; the fused score is a CONVEX combination of
    //      the two channel sigmoids, so when both probability logits agree
    //      in sign the fused prediction is decided exactly (σ(l) ≥ ½ ⟺
    //      l ≥ 0) — `both_agree` pins that tri-state; the mixed case is
    //      genuinely transcendental and NULL on both sides (pinned by
    //      FusionModelsSpec goldens instead). ------------------------------
    QueryDef.sql("q5b_fusion_weighted",
      s"""WITH $eStage,
         |$metaStages
         |SELECT vec_id,
         |  ${vecChainSql(Fixture.fcImgW(0), Fixture.fcImgB(0))} AS l_img,
         |  ${vecChainSql(Fixture.fcImgW(1), Fixture.fcImgB(1))} AS i_img,
         |  ${chainSql(Fixture.fcMetaB(0), (0 until 3).map(j => s"${d2s(Fixture.fcMetaW(0)(j))}*mf$j"))} AS l_meta,
         |  ${chainSql(Fixture.fcMetaB(1), (0 until 3).map(j => s"${d2s(Fixture.fcMetaW(1)(j))}*mf$j"))} AS i_meta,
         |  CASE WHEN l_img >= 0 AND l_meta >= 0 THEN 1
         |       WHEN l_img < 0 AND l_meta < 0 THEN 0
         |       ELSE NULL END AS both_agree
         |FROM f ORDER BY vec_id""".stripMargin) { (s, d) =>
      val f = withMetaFeatures(eFrame(s, d))
      val (lImg, iImg, lMeta, iMeta) = FusionModels.weightedChannels(
        col("emb"), mfCols, Fixture.fcImgW, Fixture.fcImgB,
        Fixture.fcMetaW, Fixture.fcMetaB)
      f.select(col("vec_id"), lImg.as("l_img"), iImg.as("i_img"),
          lMeta.as("l_meta"), iMeta.as("i_meta"))
        .withColumn("both_agree",
          when(col("l_img") >= 0 && col("l_meta") >= 0, 1)
            .when(col("l_img") < 0 && col("l_meta") < 0, 0)
            .otherwise(lit(null).cast("int")))
        .orderBy(col("vec_id"))
    },

    // ---- SE fusion (FusionNet_SEMul, mymodels.py:65-94): gate dim ==
    //      feature dim (64). The meta-MLP head rows are exact (first 3
    //      emitted); the fused score σ(z) with z = b + Σ wᵢ·embᵢ·σ(mfᵢ) is
    //      transcendental, but gate ∈ (0,1) bounds z EXACTLY:
    //      lo = b + Σ min(0, wᵢ·embᵢ) ≤ z ≤ b + Σ max(0, wᵢ·embᵢ) = hi —
    //      both chains replayed by the oracle; the contract columns carry
    //      Spark's measured truth vs the oracle's asserted invariant. ------
    QueryDef.sql("q5c_fusion_se", {
      val h = affineSql(Fixture.seL1, Seq("m0", "m1", "m2"))
        .zipWithIndex.map { case (e, i) => s"$e AS h$i" }.mkString(",\n  ")
      val f64 = affineSql(Fixture.seL2, (0 until 5).map(i => s"h$i"))
        .zipWithIndex.map { case (e, i) => s"$e AS f$i" }.mkString(",\n  ")
      val lo = chainSql(Fixture.seFcB, Fixture.seFcW.zipWithIndex.map {
        case (w, i) => s"least(0.0, ${d2s(w)}*CAST(emb[${i + 1}] AS DOUBLE))"
      })
      val hi = chainSql(Fixture.seFcB, Fixture.seFcW.zipWithIndex.map {
        case (w, i) => s"greatest(0.0, ${d2s(w)}*CAST(emb[${i + 1}] AS DOUBLE))"
      })
      s"""WITH $eStage,
         |sh AS (SELECT *, $h FROM e),
         |sf AS (SELECT *, $f64 FROM sh)
         |SELECT vec_id, f0 AS m_out0, f1 AS m_out1, f2 AS m_out2,
         |  $lo AS lo,
         |  $hi AS hi,
         |  1 AS score_in_01, 1 AS score_in_bounds
         |FROM sf ORDER BY vec_id""".stripMargin
    }) { (s, d) =>
      val e = eFrame(s, d)
      val h = FusionModels.affineCols(
        Seq(col("m0"), col("m1"), col("m2")), Fixture.seL1)
      val withH = e.select(
        e.columns.map(col) ++ h.zipWithIndex.map { case (c, i) => c.as(s"h$i") }: _*)
      val f64 = FusionModels.affineCols((0 until 5).map(i => col(s"h$i")), Fixture.seL2)
      val withF = withH.select(
        withH.columns.map(col) ++ f64.zipWithIndex.map { case (c, i) => c.as(s"f$i") }: _*)
      val mf64 = (0 until Fixture.ImgDim).map(i => col(s"f$i"))
      val z = FusionModels.seZ(col("emb"), mf64, Fixture.seFcW, Fixture.seFcB)
      val (lo, hi) = FusionModels.seBounds(col("emb"), Fixture.seFcW, Fixture.seFcB)
      val score = FusionModels.sigmoid(z)
      withF.select(col("vec_id"), col("f0").as("m_out0"),
          col("f1").as("m_out1"), col("f2").as("m_out2"),
          lo.as("lo"), hi.as("hi"), z.as("__z"), score.as("__s"))
        .withColumn("score_in_01",
          when(col("__s") > 0.0 && col("__s") < 1.0, 1).otherwise(0))
        .withColumn("score_in_bounds",
          when(col("__z") >= col("lo") && col("__z") <= col("hi"), 1).otherwise(0))
        .drop("__z", "__s")
        .orderBy(col("vec_id"))
    },

    // ---- H4 re-run on a REAL fusion model (ipynb:1563-1601 shape, q38's
    //      machinery): partition by base-CNN confidence, compare the CAT
    //      fusion model against the base on the uncertain subset. CAT's
    //      prediction is exact (logit comparison), so the whole evaluation
    //      carries a full oracle. -----------------------------------------
    QueryDef.sql("q5d_fusion_uncertain",
      s"""WITH $eStage,
         |$metaStages,
         |cp AS (SELECT vec_id, label % 2 AS y,
         |  CAST(vec_id % 100 AS DOUBLE)/100.0 AS cnn_score1,
         |  CASE WHEN CAST(vec_id % 100 AS DOUBLE)/100.0 >= 0.5
         |       THEN CAST(vec_id % 100 AS DOUBLE)/100.0
         |       ELSE 1.0 - CAST(vec_id % 100 AS DOUBLE)/100.0 END AS conf,
         |  CASE WHEN CAST(vec_id % 100 AS DOUBLE)/100.0 >= 0.5 THEN 1 ELSE 0 END AS base_pred,
         |  CASE WHEN ${catLogitSql(1)} > ${catLogitSql(0)} THEN 1 ELSE 0 END AS cat_pred
         |  FROM f),
         |m AS (SELECT 'base' AS model, base_pred AS pred, y, conf FROM cp
         |      UNION ALL SELECT 'cat', cat_pred, y, conf FROM cp),
         |u AS (SELECT v, model, pred, y FROM m,
         |        (VALUES (0.6), (0.65), (0.7)) t(v)
         |      WHERE conf <= v),
         |r AS (SELECT v, model, y,
         |        avg(CASE WHEN pred = y THEN 1.0 ELSE 0.0 END) AS rec
         |      FROM u GROUP BY v, model, y),
         |ba AS (SELECT v, model, round(avg(rec), 6) AS balanced_accuracy
         |       FROM r GROUP BY v, model),
         |n AS (SELECT v, model, count(*) AS n_uncertain FROM u GROUP BY v, model)
         |SELECT ba.v, ba.model, ba.balanced_accuracy, n.n_uncertain
         |FROM ba JOIN n ON ba.v = n.v AND ba.model = n.model
         |ORDER BY ba.v, ba.model""".stripMargin) { (s, d) =>
      val f = withMetaFeatures(eFrame(s, d))
      val logits = FusionModels.catLogits(col("emb"), mfCols,
        Fixture.catImgW, Fixture.catMetaW, Fixture.catB)
      val score1 = (col("vec_id") % 100).cast("double") / lit(100.0)
      val j = f.select(
        col("vec_id"), (col("label") % 2).as("y"),
        score1.as("cnn_score1"),
        when(score1 >= 0.5, score1).otherwise(lit(1.0) - score1).as("conf"),
        when(score1 >= 0.5, 1).otherwise(0).as("base_pred"),
        when(logits(1) > logits(0), 1).otherwise(0).as("cat_pred"))
      Fusion.uncertainSubsetBA(j, col("conf"), col("y"),
          Seq("base" -> col("base_pred"), "cat" -> col("cat_pred")),
          Seq(0.6, 0.65, 0.7))
        .select(col("v"), col("model"),
          round(col("balanced_accuracy"), 6).as("balanced_accuracy"),
          col("n_uncertain"))
        .orderBy(col("v"), col("model"))
    },

    // ---- the H6 pipeline scored by a REAL fusion head -----------------------
    // q36's end-to-end experiment DAG with TileScorer.FusionCatScorer as
    // the model: each tile's payload decodes to the CAT head's 64-dim
    // image vector, the slide key to the metadata vector, and score1 is
    // the integer-valued floor(1024·(logit1−logit0)) — so per-slide
    // averages are summation-order-exact and the WHOLE pipeline (ingest →
    // impute → folds → fusion-head scoring → roll-up → BA/AUROC) carries a
    // full hash oracle. The oracle regenerates the identical logit chains
    // from the same Scala weight fixtures (left-associative, dyadic
    // weights — the q5a bit-exactness argument, per tile).
    QueryDef.sql("q5h_fusion_pipeline", {
      val m = Seq("CAST(o_custkey % 7 AS DOUBLE)/8.0",
        "CAST(o_custkey % 5 AS DOUBLE)/8.0", "CAST(o_custkey % 2 AS DOUBLE)")
      val h = affineSql(Fixture.metaL1, m)
        .zipWithIndex.map { case (e, i) => s"$e AS h$i" }.mkString(",\n  ")
      val mf = affineSql(Fixture.metaL2, (0 until 5).map(i => s"h$i"))
        .zipWithIndex.map { case (e, i) => s"$e AS mf$i" }.mkString(",\n  ")
      def logit(c: Int): String = (0 until 3).foldLeft(
        chainSql(Fixture.catB(c), (0 until Fixture.ImgDim).map { j =>
          s"${d2s(Fixture.catImgW(c)(j))}*(CAST((v + $j) % 47 - 23 AS DOUBLE)/16.0)"
        })) { (acc, j) => s"$acc + ${d2s(Fixture.catMetaW(c)(j))}*mf$j" }
      s"""WITH m0 AS (
         |  SELECT CAST(c_custkey AS VARCHAR) AS slide_name,
         |    CAST(c_custkey % 2 AS INT) AS label,
         |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS age,
         |    CASE WHEN c_custkey % 5 = 0 THEN NULL
         |         ELSE CAST(c_nationkey % 2 AS INT) END AS gender,
         |    CASE WHEN c_nationkey < 12 THEN 0 ELSE 1 END AS lab
         |  FROM customer),
         |imp AS (
         |  SELECT slide_name, label, lab,
         |    coalesce(age, (SELECT avg(age) FROM m0)) AS age,
         |    coalesce(gender, (SELECT gender FROM m0 WHERE gender IS NOT NULL
         |                      GROUP BY gender ORDER BY count(*) DESC, gender
         |                      LIMIT 1)) AS gender
         |  FROM m0),
         |fld AS (
         |  SELECT *, CAST((row_number() OVER (PARTITION BY label, lab
         |    ORDER BY slide_name) - 1) % 5 AS INT) AS fold FROM imp),
         |st AS (SELECT *, CASE WHEN fold < 1 THEN 'val' WHEN fold < 3 THEN 'test'
         |                      ELSE 'train' END AS s FROM fld),
         |t0 AS (SELECT CAST(o_custkey AS VARCHAR) AS slide_name, o_custkey,
         |         l_partkey AS v
         |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |       WHERE l_orderkey % 5 = 0),
         |th AS (SELECT *, $h FROM t0),
         |tf AS (SELECT *, $mf FROM th),
         |ts AS (SELECT slide_name,
         |         floor(((${logit(1)}) - (${logit(0)})) * 1024.0) AS score1
         |       FROM tf),
         |sl AS (SELECT t.slide_name, avg(t.score1) AS score, max(m.label) AS label,
         |         max(m.fold) AS fold, max(m.s) AS s
         |       FROM ts t JOIN st m ON t.slide_name = m.slide_name
         |       GROUP BY t.slide_name),
         |sp AS (SELECT *, CASE WHEN score >= 0 THEN 1 ELSE 0 END AS pred FROM sl),
         |ba AS (SELECT fold, s, avg(rec) AS balanced_accuracy FROM (
         |         SELECT fold, s, label,
         |           avg(CASE WHEN pred = label THEN 1.0 ELSE 0.0 END) AS rec
         |         FROM sp GROUP BY fold, s, label) GROUP BY fold, s),
         |g AS (SELECT fold, s, score, sum(label) AS pos, count(*) AS n
         |      FROM sp GROUP BY 1, 2, 3),
         |rk AS (SELECT *, sum(n) OVER (PARTITION BY fold, s ORDER BY score
         |         ROWS UNBOUNDED PRECEDING) AS cum FROM g),
         |au AS (SELECT fold, s,
         |         (sum(pos*((2.0*cum - n + 1)/2)) - sum(pos)*(sum(pos)+1)/2.0)
         |           / (sum(pos)*(sum(n)-sum(pos))) AS auroc
         |       FROM rk GROUP BY 1, 2)
         |SELECT ba.fold, ba.s AS "set",
         |  round(ba.balanced_accuracy, 6) AS balanced_accuracy,
         |  round(au.auroc, 6) AS auroc
         |FROM ba JOIN au ON ba.fold = au.fold AND ba.s = au.s
         |ORDER BY ba.fold""".stripMargin
    }) { (s, d) =>
      import graft.pipeline.{Experiment, TileScorer}
      import graft.pipeline.TileScorer.tileEnc
      val cust = Tables.customer(s, d)
      def mk(df: DataFrame) = df.select(
        col("c_custkey").cast("string").as("slide_name"),
        (col("c_custkey") % 2).cast("int").as("label"),
        when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal")).as("age"),
        when(col("c_custkey") % 5 === 0, lit(null))
          .otherwise((col("c_nationkey") % 2).cast("int")).as("gender"))
      val cfg = Experiment.Config(catCols = Seq("gender"), rollupThreshold = 0.0)
      val meta = Experiment.ingest(Seq(
        mk(cust.where(col("c_nationkey") < 12)),
        mk(cust.where(col("c_nationkey") >= 12))))
      val prepared = Experiment.prepare(meta, cfg)
      // a deterministic 1/5 tile subset keeps this second q36-shaped DAG
      // from dominating the suite wall; the oracle applies the same cut
      val tiles = Tables.lineitem(s, d)
        .where(col("l_orderkey") % 5 === 0)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("string").as("slide_name"),
          col("l_linenumber").cast("int").as("tile_col"),
          lit(0).as("tile_row"),
          to_binary(lpad(hex(col("l_partkey")), 16, "0"), lit("hex")).as("payload"))
        .as[graft.pipeline.Tile](tileEnc)
      val tileScores = TileScorer.score(tiles, TileScorer.FusionCatScorer())
      Experiment.evaluate(prepared, tileScores, cfg)
        .select(col("fold"), col("set"),
          round(col("balanced_accuracy"), 6).as("balanced_accuracy"),
          round(col("auroc"), 6).as("auroc"))
        .orderBy(col("fold"))
    }
  )
}
