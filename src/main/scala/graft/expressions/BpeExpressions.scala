package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document BPE segmentation stats as ONE fused scalar kernel:
  * struct(n_words, n_tokens) — word count plus the total subword token
  * count after applying the learned merge list in rank order — in a
  * single tokenize pass.
  *
  * MERGE SEMANTICS (the oracle contract): each merge is one LEFTMOST
  * NON-OVERLAPPING pass over the word's symbol array
  * ([[BpeStats.applyMerge]] — after a merge the scan continues AFTER the
  * merged symbol). On the bracketed string form `[a][b][c]` this is
  * EXACTLY what SQL `replace(s, '[l][r]', '[lr]')` computes: brackets
  * make matches full-symbol-anchored (no false match where one symbol's
  * suffix plus the next symbol spells the pair) and non-sharing (adjacent
  * matches share no delimiter), so the q5z oracle replays segmentation
  * with a chain of plain replace() calls and counts tokens as
  * `length(s) - length(replace(s, '[', ''))`.
  *
  * Per-task memoization: segmentation is per-WORD, and corpora repeat
  * words heavily — each task caches word → token count up to a bounded
  * number of distinct words (beyond the cap it computes without caching;
  * results are identical either way).
  */
case class BpeStats(child: Expression,
                    merges: Array[(String, String)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if merges.forall { case (l, r) =>
        l.nonEmpty && r.nonEmpty && !(l + r).exists(c => c == '[' || c == ']') } =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_stats requires STRING and bracket-free non-empty merge pairs, " +
        s"got ${t.simpleString} / ${merges.length} merges")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  private val CacheCap = 1 << 16

  // ConcurrentHashMap, NOT HashMap: the expression instance (and with it
  // this cache) can be shared by several task threads in the same JVM —
  // codegen holds it as one reference object — and a plain HashMap under
  // concurrent put() is a data race. Reads/writes here are value-identical
  // regardless of interleaving (the cached count is a pure function of the
  // word), so the race would only ever corrupt the map structure, which
  // CHM rules out. The cap check races benignly (a few extra entries).
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[UTF8String, Integer](4096)

  private def tokCount(w: UTF8String): Int = {
    val hit = cache.get(w)
    if (hit != null) return hit.intValue()
    var syms = BpeStats.codepointSyms(w.toString)
    var i = 0
    while (i < merges.length && syms.length > 1) {
      syms = BpeStats.applyMerge(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    val n = syms.length
    if (cache.size < CacheCap) cache.put(w.clone(), Integer.valueOf(n))
    n
  }

  def stats(text: UTF8String): InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    var nT = 0L
    var i = 0
    while (i < toks.length) {
      nT += tokCount(toks(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length.toLong, nT))
  }

  override def nullSafeEval(v: Any): Any = stats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeStats", this, classOf[BpeStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.stats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeStats =
    copy(child = newChild)
}

/** Per-document BPE token-ID segmentation as ONE fused scalar kernel:
  * array<int> of subword token ids in reading order — the sequence a
  * trainer (and [[graft.operators.Curate.packSequences]]) consumes,
  * where [[BpeStats]] only counts. Same merge semantics, same bracketed
  * SQL-replay contract (the oracle maps each replayed symbol to its id
  * through the model's bounded vocab embedded as a literal VALUES
  * table); unseen codepoints emit [[graft.ml.BpeTokenizer.UnkId]].
  *
  * Same bounded per-task word memoization as [[BpeStats]] — here the
  * cached value is the word's id array (bounded: ≤ word codepoints).
  */
case class BpeTokenIds(child: Expression,
                       model: graft.ml.BpeTokenizer.BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if model.merges.forall { case (l, r) =>
        l.nonEmpty && r.nonEmpty && !(l + r).exists(c => c == '[' || c == ']') } =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_ids requires STRING and bracket-free non-empty merge " +
        s"pairs, got ${t.simpleString} / ${model.merges.length} merges")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val CacheCap = 1 << 16

  // see BpeStats.cache for why ConcurrentHashMap
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[UTF8String, Array[Int]](4096)
  @transient private lazy val mergeArr = model.merges.toArray
  @transient private lazy val ids = model.vocabIds

  private def wordIds(w: UTF8String): Array[Int] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = BpeStats.codepointSyms(w.toString)
    var i = 0
    while (i < mergeArr.length && syms.length > 1) {
      syms = BpeStats.applyMerge(syms, mergeArr(i)._1, mergeArr(i)._2)
      i += 1
    }
    val out = new Array[Int](syms.length)
    i = 0
    while (i < syms.length) {
      out(i) = ids.getOrElse(syms(i), graft.ml.BpeTokenizer.UnkId)
      i += 1
    }
    if (cache.size < CacheCap) cache.put(w.clone(), out)
    out
  }

  def segment(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = WordShinglesKernel.tokenize(text)
    var n = 0
    var i = 0
    val perWord = new Array[Array[Int]](toks.length)
    while (i < toks.length) {
      perWord(i) = wordIds(toks(i))
      n += perWord(i).length
      i += 1
    }
    val flat = new Array[Any](n)
    var o = 0
    i = 0
    while (i < toks.length) {
      val w = perWord(i)
      var j = 0
      while (j < w.length) { flat(o) = w(j); o += 1; j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(flat)
  }

  override def nullSafeEval(v: Any): Any = segment(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenIds", this, classOf[BpeTokenIds].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.segment($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenIds =
    copy(child = newChild)
}

object BpeTokenIds {
  def apply(text: Column, model: graft.ml.BpeTokenizer.BpeModel): Column =
    ColumnBridge.column(
      new BpeTokenIds(ColumnBridge.expression(text), model))
}

object BpeStats {
  def apply(text: Column, merges: Array[(String, String)]): Column =
    ColumnBridge.column(
      new BpeStats(ColumnBridge.expression(text), merges))

  /** A word's base symbol array: one symbol per Unicode CODEPOINT, not per
    * UTF-16 unit — `String.map(_.toString)` would split a surrogate pair
    * into two broken half-symbols while the oracle's `regexp_replace(w,
    * '(.)', '[\1]')` wraps whole codepoints, silently diverging on any
    * non-BMP input (r11 ADVICE). The ONE base-alphabet definition shared
    * by the fit loop and the scoring kernel.
    */
  def codepointSyms(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var n = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val len = Character.charCount(cp)
      out(n) = w.substring(i, i + len)
      n += 1
      i += len
    }
    out
  }

  /** One merge pass over a symbol array: LEFTMOST NON-OVERLAPPING — after
    * a merge the scan continues AFTER the merged symbol, so `a a a` with
    * pair (a,a) yields `[aa, a]`. The ONE definition shared by the fit
    * loop, the scoring kernel, and (via the bracketed replace()
    * equivalence in the class doc) the SQL oracle.
    */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new Array[String](syms.length)
    var n = 0
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out(n) = l + r; n += 1; i += 2
      } else {
        out(n) = syms(i); n += 1; i += 1
      }
    }
    java.util.Arrays.copyOf(out, n)
  }
}
