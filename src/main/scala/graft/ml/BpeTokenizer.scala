package graft.ml

import graft.expressions.WordShingles
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
  * subword-vocabulary step every pretraining pipeline runs between corpus
  * curation and training consumption.
  *
  * Design for 100 TB: the original BPE algorithm operates on the WORD
  * VOCABULARY with counts, not on the raw corpus — so the only
  * distributed work is the capped word-count fit (ONE scan + one bounded
  * top-V, the LM-fit shape), and the merge loop runs driver-local over
  * ≤ vocabCap words (the q5l bounded-fit discipline). Applying the
  * tokenizer is a zero-shuffle fused kernel scan
  * ([[graft.expressions.BpeStats]]).
  *
  * DETERMINISM / ORACLE CONTRACT: the vocabulary truncates on the exact
  * (count desc, word asc) order; each merge round picks the pair with
  * (weighted count desc, then pair lexicographic asc); merges APPLY in
  * rank order with leftmost non-overlapping matching — exactly the
  * semantics of SQL `replace()` over the space-separated symbol string,
  * which is what lets the q5z oracle replay tokenization verbatim with a
  * chain of replace() calls.
  */
object BpeTokenizer {

  /** A learned merge list, rank order. Each entry is (left, right) —
    * applying it rewrites adjacent symbol pair `left right` to the
    * concatenation `left+right`.
    */
  type Merges = Seq[(String, String)]

  /** Fit `nMerges` BPE merges from the corpus: ONE capped word-count job,
    * then the driver-local Sennrich loop. Stops early when no pair occurs
    * at least twice (merging singleton pairs would just memorize words).
    */
  def fit(corpus: DataFrame, text: Column, vocabCap: Int,
          nMerges: Int): Merges = {
    require(vocabCap > 0 && nMerges > 0,
      s"bad BPE geometry: vocabCap=$vocabCap nMerges=$nMerges")
    val vocab: Array[(Array[String], Long)] = corpus
      .select(explode(WordShingles.gramCounts(text, 1)).as("g"))
      .groupBy(col("g.gram").as("w")).agg(sum(col("g.cnt")).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(vocabCap)
      .collect()
      .map(r => (graft.expressions.BpeStats.codepointSyms(r.getString(0)),
        r.getLong(1)))
    // SQL-replay contract guard: the q5z oracle anchors merges on the
    // bracketed symbol form `[a][b][c]`, so bracket characters inside a
    // vocabulary word would break the anchoring silently. Fail loudly at
    // fit time instead (r11 ADVICE) — a corpus whose frequent words carry
    // brackets needs pre-cleaning before SQL-replayable BPE.
    vocab.find(_._1.exists(s => s == "[" || s == "]")).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"BPE vocab word '${w.mkString}' contains '[' or ']' — the " +
          "bracketed-replace oracle contract requires bracket-free words")
    }
    val words = vocab.map(_._1.clone())
    val counts = vocab.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = words.isEmpty
    while (round < nMerges && !done) {
      // weighted pair counts over the vocabulary (pairs within words only)
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        var i = 0
        while (i < w.length - 1) {
          val k = (w(i), w(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + counts(wi))
          i += 1
        }
        wi += 1
      }
      val best = pc.filter(_._2 >= 2L)
      if (best.isEmpty) done = true
      else {
        // (count desc, left asc, right asc) — one total order, refit-stable
        val (pair, _) = best.minBy { case ((l, r), c) => (-c, l, r) }
        merges += pair
        wi = 0
        while (wi < words.length) {
          words(wi) = graft.expressions.BpeStats.applyMerge(
            words(wi), pair._1, pair._2)
          wi += 1
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Per-document BPE stats — (doc_id, n_words, n_tokens): tokenize the
    * text, segment every word with `merges` in rank order, count the
    * resulting subword tokens. Zero-shuffle fused kernel scan.
    */
  def tokenStats(docs: DataFrame, id: Column, text: Column,
                 merges: Merges): DataFrame =
    docs.select(id.as("doc_id"),
        graft.expressions.BpeStats(text, merges.toArray).as("__s"))
      .select(col("doc_id"),
        col("__s.n_words").as("n_words"),
        col("__s.n_tokens").as("n_tokens"))
}
