package graft.ml

import graft.expressions.{BigramLmScore, WordShingles}
import graft.functions.TextFunctions
import graft.plans.GroupedTopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus n-gram language model for LM-based quality filtering — the
  * CCNet/RedPajama recipe: fit a small n-gram LM, score every document's
  * per-token log-likelihood, and filter/bucket by perplexity. (The
  * reference's quality signals are heuristic-only; this is the learned
  * counterpart used by every modern pretraining-data pipeline.)
  *
  * Design for 100 TB:
  *   - FIT is ONE corpus scan: the fused [[WordShingles.multiGramCounts]]
  *     kernel emits unigram and bigram counts from a single tokenize pass
  *     per document (one shuffled row per DISTINCT (n, gram) per document),
  *     one (n, gram) hash aggregation reduces them, and the bounded-heap
  *     [[GroupedTopK]] physical operator takes the per-n top-V in the same
  *     job (map-side partial heaps — no full sort of the gram table, no
  *     second corpus read). The deterministic count-desc/gram-asc order
  *     caps the model regardless of corpus size.
  *   - The fitted model is MATERIALIZED at fit time (one bounded collect,
  *     ≤ uniCap + biCap rows by construction): every subsequent
  *     score/gate/save call reuses the arrays — no lazy-lineage refits.
  *   - SCORE is the fused [[BigramLmScore]] kernel by default: the whole
  *     per-document readout (gram count, OOV count, integer score) is ONE
  *     codegen'd projection with ZERO shuffle — no explode, no joins, no
  *     aggregation. The bounded model rides the expression (its caps are
  *     what make that sound); [[scoreDocsJoined]] keeps the broadcast-join
  *     formulation for models too large to embed, and the two paths are
  *     spec-pinned row-equal.
  *   - EXACTNESS: each per-bigram log-probability is scaled to micro-nats
  *     and rounded to a LONG **before** summation, so the per-document
  *     score is an integer sum — order-independent, retry-stable, and
  *     replayable bit-for-bit by any ANSI engine (the q5k oracle).
  *   - PERSISTENCE ([[save]]/[[load]]): the CCNet deployment shape is
  *     fit-once-on-a-clean-reference-corpus, gate-every-ingest-batch — the
  *     count tables round-trip parquet exactly (integer counts, lossless
  *     strings), so a loaded model gates identically to the fitted one
  *     (q5p pins the round-trip through a DuckDB oracle).
  *
  * Model: add-one-smoothed n-gram conditional with a fixed add-V
  * denominator: p(w_n|ctx) = (c(ctx w_n) + 1) / (c(ctx) + V) where ctx is
  * the (order-1)-gram context and V = the context-table cap (for the
  * default order 2: p(w2|w1) with V = uniCap, the vocabulary cap).
  * [[fitOrder]] generalizes beyond bigrams (order 3 → trigram model) with
  * the SAME single-scan fit, kernels, persistence, and gate — the q5s
  * oracle replays the trigram readout end-to-end. Out-of-model grams fall
  * back to count 0, so unseen text scores low — exactly the
  * junk-detection behavior the filter wants.
  */
object NgramLm {

  /** Fitted model, materialized: bounded unigram/bigram count arrays
    * (count desc, gram asc — the fit's deterministic truncation order) +
    * the geometry they were fitted with. Bounded by `uniCap`/`biCap` rows,
    * so driver residency and broadcast are sound by construction.
    */
  final case class BigramLm(uniArr: Array[(String, Long)],
                            biArr: Array[(String, Long)],
                            uniCap: Int, biCap: Int,
                            order: Int = 2) {
    /** The unigram table as a frame (join path, persistence). */
    def uniDF(spark: SparkSession): DataFrame =
      spark.createDataFrame(uniArr.toIndexedSeq).toDF("w", "c")
    /** The bigram table as a frame (join path, persistence). */
    def biDF(spark: SparkSession): DataFrame =
      spark.createDataFrame(biArr.toIndexedSeq).toDF("b", "c")
  }

  /** Caps up to this total embed the model in the fused scoring kernel;
    * larger models score through the broadcast-join path. Sized so the
    * serialized expression stays a few tens of MB at worst.
    */
  val KernelModelMaxRows: Int = 1 << 20

  /** Fit the bounded bigram LM over `corpus(text)` in ONE corpus scan (see
    * the object doc). Ties at the cap break deterministically (count desc,
    * gram asc) so refits — and the oracle's SQL replay — always select the
    * identical model. Runs the fit job eagerly and returns the
    * materialized model.
    */
  def fit(corpus: DataFrame, text: Column, uniCap: Int = 65536,
          biCap: Int = 1 << 20): BigramLm =
    fitOrder(corpus, text, 2, uniCap, biCap)

  /** Order-n generalization of [[fit]] (order=3 → trigram model): the
    * context table holds (order-1)-gram counts and the gram table
    * order-gram counts, from the same single corpus scan (the fused
    * kernel emits every order 1..n per document; the sub-context orders
    * are filtered out before the aggregation, so the only waste is a
    * per-document local map, never a shuffle or a second read). The
    * add-V smoothing constant is `ctxCap` — at order 2 this is exactly
    * the vocabulary-cap convention the bigram model always had.
    */
  def fitOrder(corpus: DataFrame, text: Column, order: Int,
               ctxCap: Int, gramCap: Int): BigramLm = {
    require(order >= 2, s"order must be >= 2, got $order")
    require(ctxCap > 0 && gramCap > 0, s"caps must be positive: $ctxCap/$gramCap")
    val agg = corpus
      .select(explode(WordShingles.multiGramCounts(text, order)).as("__g"))
      .where(col("__g.n").isin(order - 1, order))
      .groupBy(col("__g.n").as("n"), col("__g.gram").as("g"))
      .agg(sum(col("__g.cnt")).as("c"))
    // per-n top-V with the bounded-heap operator: map-side partial heaps
    // keep ≤ k rows per (partition, n) below the exchange, so neither the
    // full gram table nor a per-n sort ever materializes. k is the larger
    // cap; the exact per-n trim happens on the ≤ 2k collected rows.
    val k = math.max(ctxCap, gramCap)
    val top = GroupedTopK.perGroup(agg, Seq(col("n")),
      struct((-col("c")).as("nc"), col("g").as("gg")), k)
      .collect()
    def takeTop(n: Int, cap: Int): Array[(String, Long)] = top.iterator
      .filter(_.getInt(0) == n)
      .map(r => (r.getString(1), r.getLong(2)))
      .toArray
      .sortBy { case (g, c) => (-c, g) }
      .take(cap)
    BigramLm(takeTop(order - 1, ctxCap), takeTop(order, gramCap),
      ctxCap, gramCap, order)
  }

  /** Persist a fitted model — the artifact-store discipline of the RF
    * classifier (q39) applied to the CCNet fit-once/gate-forever
    * deployment shape. ONE write job: both count tables in a single
    * parquet table tagged by gram order (exact longs + lossless strings,
    * coalesced to one file — the model is cap-bounded by construction),
    * plus a job-free sidecar `meta.json` recording the caps (written
    * through the path's Hadoop FileSystem, so it lands wherever the
    * parquet does).
    */
  def save(spark: SparkSession, model: BigramLm, path: String): Unit = {
    model.uniDF(spark).select(lit(1).as("n"), col("w").as("gram"), col("c"))
      .unionByName(model.biDF(spark)
        .select(lit(2).as("n"), col("b").as("gram"), col("c")))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/counts")
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"""{"uniCap": ${model.uniCap}, "biCap": ${model.biCap}, """ +
        s""""order": ${model.order}}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a model written by [[save]] (one read job + the sidecar). The
    * arrays are re-sorted into the canonical (count desc, gram asc)
    * order, so the loaded model is bit-identical to the fitted one
    * regardless of parquet row order.
    */
  def load(spark: SparkSession, path: String): BigramLm = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaTxt = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(p)),
      java.nio.charset.StandardCharsets.UTF_8)
    def cap(k: String): Int =
      s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(metaTxt)
        .getOrElse(throw new IllegalArgumentException(
          s"malformed LM meta at $p: $metaTxt")).group(1).toInt
    val rows = spark.read.parquet(s"$path/counts").collect()
    def counts(n: Int): Array[(String, Long)] = rows.iterator
      .filter(_.getInt(0) == n)
      .map(r => (r.getString(1), r.getLong(2)))
      .toArray
      .sortBy { case (g, c) => (-c, g) }
    BigramLm(counts(1), counts(2), cap("uniCap"), cap("biCap"),
      cap("order"))
  }

  /** Score `docs(id, text)` against a fitted model. Output (the id column
    * is emitted as `doc_id` regardless of its input name), one row per
    * document with at least one bigram (≥ 2 tokens):
    *   - `n_bigrams`   — scored gram count
    *   - `oov_bigrams` — grams absent from the bigram table
    *   - `lm_score`    — Σ round(1e6 · ln p(w2|w1)), an exact LONG
    *   - `ppl`         — exp(−lm_score / (1e6 · n_bigrams)), the usual
    *                     perplexity readout (rounded to 6 dp)
    *
    * Picks the fused kernel when the caps bound the model small enough to
    * embed; the join path otherwise. Both produce identical rows.
    */
  def scoreDocs(docs: DataFrame, id: Column, text: Column,
                model: BigramLm): DataFrame =
    if (model.uniCap.toLong + model.biCap.toLong <= KernelModelMaxRows)
      scoreDocsKernel(docs, id, text, model)
    else scoreDocsJoined(docs, id, text, model)

  /** Fused-kernel scoring: one zero-shuffle projection per document. The
    * materialized model rides the expression to every task.
    */
  def scoreDocsKernel(docs: DataFrame, id: Column, text: Column,
                      model: BigramLm): DataFrame =
    withPpl(docs
      .select(id.as("doc_id"),
        BigramLmScore(text, model.uniArr, model.biArr,
          model.uniCap.toLong, model.order).as("__s"))
      .select(col("doc_id"),
        col("__s.n_bigrams").as("n_bigrams"),
        col("__s.oov_bigrams").as("oov_bigrams"),
        col("__s.lm_score").as("lm_score"))
      .filter(col("n_bigrams") > 0))

  /** Broadcast-join scoring — the formulation for models beyond the
    * kernel-embed bound: lazy `zip_with` bigram generate, two broadcast
    * model joins, one per-document partial aggregation.
    */
  def scoreDocsJoined(docs: DataFrame, id: Column, text: Column,
                      model: BigramLm): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(id.as("__id"), TextFunctions.tokens(text).as("__t"))
    val grams = toks
      .select(col("__id"),
        explode(gramArray(col("__t"), model.order)).as("b"))
      .withColumn("w1",
        if (model.order == 2) split(col("b"), " ").getItem(0)
        else array_join(
          slice(split(col("b"), " "), 1, model.order - 1), " "))
    val uni = broadcast(model.uniDF(spark).withColumnRenamed("c", "__c1"))
    val bi = broadcast(model.biDF(spark).withColumnRenamed("c", "__c2"))
    val joined = grams
      .join(uni, grams("w1") === uni("w"), "left")
      .join(bi, grams("b") === bi("b"), "left")
    val c1 = coalesce(col("__c1"), lit(0L))
    val c2 = coalesce(col("__c2"), lit(0L))
    // micro-nat log-probability, rounded per term BEFORE the sum: the
    // argument of ln is an IEEE division of exact integers, identical in
    // every engine, so the rounded term — and therefore the integer sum —
    // replays exactly.
    val term = round(lit(1e6) *
      log((c2 + lit(1L)).cast("double") /
          (c1 + lit(model.uniCap.toLong)).cast("double"))).cast("long")
    withPpl(joined
      .groupBy(col("__id").as("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__c2").isNull, 1L).otherwise(0L)).as("oov_bigrams"),
        sum(term).as("lm_score")))
  }

  /** Order-gram strings (`"w1 w2"`, `"w1 w2 w3"`, …) of a token array,
    * as a lazy collection projection — no explode, no shuffle, reusable
    * under any downstream generate. Order 2 keeps the zip_with form;
    * higher orders window via transform-over-sequence (interpreted
    * lambdas — acceptable on the oversized-model fallback path only).
    */
  private def gramArray(toks: Column, order: Int): Column =
    if (order == 2)
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))
    else
      when(size(toks) >= order,
        transform(sequence(lit(1), size(toks) - (order - 1)),
          i => concat_ws(" ", slice(toks, i, lit(order)))))
        .otherwise(array().cast("array<string>"))

  /** The shared perplexity readout — ONE arithmetic shape for both scoring
    * paths and the SQL oracle.
    */
  private def withPpl(scored: DataFrame): DataFrame =
    scored.withColumn("ppl",
      round(exp(-col("lm_score").cast("double") /
        (lit(1e6) * col("n_bigrams").cast("double"))), 6))

  /** fit + score in one call (self-scoring a corpus, the common audit). */
  def selfScore(corpus: DataFrame, id: Column, text: Column,
                uniCap: Int = 65536, biCap: Int = 1 << 20): DataFrame =
    scoreDocs(corpus, id, text, fit(corpus, text, uniCap, biCap))

  /** Perplexity gate — the CCNet filter itself: keep documents whose
    * perplexity against `model` (typically fitted on a clean reference
    * corpus) is at most `maxPpl`. Documents with fewer than two tokens
    * have no defined perplexity and are dropped.
    *
    * With an embeddable model this is a ZERO-shuffle scan filter: the
    * fused kernel evaluates inline in the gate predicate, so the whole
    * filter runs at scan speed with no joins and no aggregation — the
    * shape a 100 TB quality pass needs. Oversized models gate through
    * [[scoreDocsJoined]] + a bare-id semi-join. The threshold compares
    * the same 6-dp-rounded `ppl` that [[scoreDocs]] emits, so the kept
    * set is exactly `scoreDocs(...).filter(ppl <= maxPpl)` on every path
    * and in the SQL oracle.
    */
  def pplGate(docs: DataFrame, id: Column, text: Column, model: BigramLm,
              maxPpl: Double): DataFrame =
    if (model.uniCap.toLong + model.biCap.toLong <= KernelModelMaxRows) {
      // the fused boolean kernel, NOT per-field getField over the score
      // struct: a filter condition re-evaluates a struct expression per
      // field reference (no CSE across FilterExec conjuncts — measured 3
      // kernel instances in the optimized plan), this evaluates once
      docs.filter(graft.expressions.BigramLmGate(
        text, model.uniArr, model.biArr, model.uniCap.toLong, maxPpl,
        model.order))
    } else {
      val keep = scoreDocsJoined(docs, id, text, model)
        .filter(col("ppl") <= maxPpl)
        .select(col("doc_id").as("__keep_id"))
      docs.join(keep, id === col("__keep_id"), "left_semi")
    }
}
