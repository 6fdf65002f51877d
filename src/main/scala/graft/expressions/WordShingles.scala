package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling in one native pass: tokenize (same semantics as
  * `split(trim(text), "\\s+")` — it calls the identical UTF8String.split),
  * join each n-window with single spaces, and dedupe preserving first
  * occurrence (array_distinct semantics).
  *
  * The composable formulation (`transform` over `sequence` with
  * `concat_ws`/`slice` lambdas) is interpreted per element and re-slices the
  * token array per shingle; this kernel is a single loop inside whole-stage
  * codegen. Bit-identical output is pinned by TextFunctionsSpec.
  */
object WordShinglesKernel {
  private val SPACE: UTF8String = UTF8String.fromString(" ")

  /** Byte-level replication of `trim(text).toString.split("\\s+", -1)`
    * (r18 — previously a compiled-Pattern split; the probe's executor-CPU
    * sweep put this tokenizer under more than half of the suite's top CPU
    * rows via shingles/jaccard/term counts). Java's `\s` class without
    * UNICODE_CHARACTER_CLASS is exactly the six ASCII bytes
    * 0x09–0x0D + 0x20, and multi-byte UTF-8 sequences never contain
    * bytes < 0x80, so scanning raw UTF-8 bytes is equivalent to the regex
    * over the decoded string — with zero UTF-16 decode, zero regex
    * machinery, zero re-encode, and zero-copy token slices
    * (`fromBytes(bytes, start, len)` wraps the parent array). Split edge
    * semantics replicated bit-for-bit (pinned by TextFunctionsSpec +
    * fuzz): empty input → [""], a leading separator run → leading "",
    * a trailing run with limit -1 → trailing "", interior runs collapse.
    * (Only observable deviation: malformed UTF-8 bytes pass through
    * verbatim where the old String round-trip substituted U+FFFD —
    * unreachable from parquet string columns, which are valid UTF-8 by
    * spec.)
    */
  private[expressions] def tokenize(text: UTF8String): Array[UTF8String] = {
    val t = text.trim() // ASCII-space trim, same call as the old path
    val bytes = t.getBytes
    val n = bytes.length
    if (n == 0) return Array(UTF8String.EMPTY_UTF8)
    @inline def ws(b: Byte): Boolean =
      b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0D.toByte)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      math.min(n / 4 + 1, 64))
    var i = 0
    var start = 0
    while (i < n) {
      if (ws(bytes(i))) {
        out += UTF8String.fromBytes(bytes, start, i - start)
        while (i < n && ws(bytes(i))) i += 1
        start = i
        if (i == n) out += UTF8String.EMPTY_UTF8
      } else i += 1
    }
    if (start < n) out += UTF8String.fromBytes(bytes, start, n - start)
    out.toArray
  }

  private[expressions] def joinWith(sep: UTF8String,
                                    parts: Array[UTF8String]): UTF8String =
    UTF8String.concatWs(sep, parts: _*)

  private[expressions] val SpaceSep: UTF8String = SPACE

  /** All window grams WITH duplicates, in position order — the single
    * windowing implementation both public forms derive from (so the
    * short-text collapse rule cannot drift between them).
    */
  private def windowGrams(text: UTF8String, n: Int): Array[AnyRef] = {
    val toks = tokenize(text)
    if (toks.length < n) Array[AnyRef](UTF8String.concatWs(SPACE, toks: _*))
    else {
      val arr = new Array[AnyRef](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val parts = new Array[UTF8String](n)
        System.arraycopy(toks, i, parts, 0, n)
        arr(i) = UTF8String.concatWs(SPACE, parts: _*)
        i += 1
      }
      arr
    }
  }

  /** The distinct shingle set (first-occurrence order). */
  def shingleSet(text: UTF8String, n: Int): java.util.LinkedHashSet[UTF8String] = {
    val grams = windowGrams(text, n)
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < grams.length) { out.add(grams(i).asInstanceOf[UTF8String]); i += 1 }
    out
  }

  def compute(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      shingleSet(text, n).toArray.asInstanceOf[Array[AnyRef]])

  /** All word n-grams WITH duplicates (one per window position) — the
    * occurrence sequence repetition statistics need; [[compute]] is the
    * distinct-set form dedup needs. Both derive from [[windowGrams]], so
    * tokenizer and short-text collapse are one implementation.
    */
  def computeAll(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(windowGrams(text, n))

  /** Gopher repetition signals in ONE pass: total gram occurrences, the
    * top gram's occurrence fraction, and the distinct fraction — a local
    * gram→count map per document instead of explode + two hash
    * aggregations. Counts key on gram TEXT (UTF8String equality), which
    * matches the SQL-oracle semantics even in the (vanishing) case where
    * the old 64-bit-fingerprint aggregation would collide two grams.
    * Arithmetic mirrors the aggregate form exactly: integer counts, one
    * double division each.
    */
  def repetitionStats(text: UTF8String,
                      n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val grams = windowGrams(text, n)
    val counts = new java.util.HashMap[UTF8String, Int](grams.length * 2)
    var maxC = 0
    var i = 0
    while (i < grams.length) {
      val c = counts.merge(grams(i).asInstanceOf[UTF8String], 1, Integer.sum)
      if (c > maxC) maxC = c
      i += 1
    }
    val total = grams.length.toLong
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, maxC.toDouble / total, counts.size.toDouble / total))
  }

  /** Per-document term frequencies in one pass: `array<struct(term, tf)>`
    * with first-occurrence order (deterministic) — the local-map form of
    * `explode(tokens) → groupBy(doc, term) → count`, whose exchange
    * shuffles every token INSTANCE of the corpus for per-document counts.
    * Tokenization is [[tokenize]] — byte-identical to
    * `split(trim(text), "\\s+")`.
    */
  def termCounts(text: UTF8String): ArrayData = {
    val toks = tokenize(text)
    val counts = new java.util.LinkedHashMap[UTF8String, Int](toks.length * 2)
    var i = 0
    while (i < toks.length) { counts.merge(toks(i), 1, Integer.sum); i += 1 }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue.toLong))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document n-gram counts with STRICT windows (a text shorter than
    * `n` tokens yields NO grams — matching the composable
    * `zip_with(slice, slice, concat_ws)` bigram form and the SQL
    * `[t[i+1] || ' ' || t[i+2] for i in range(len(t)-1)]` replay, unlike
    * [[windowGrams]]' whole-text collapse): `array<struct(gram, cnt)>` in
    * first-occurrence order. The local-map form of
    * `explode(grams) → groupBy(gram) → count` per document — a corpus
    * gram-count fit over this output shuffles one row per DISTINCT gram
    * per document instead of one per occurrence.
    */
  def gramCounts(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val counts = new java.util.LinkedHashMap[UTF8String, Int](toks.length * 2)
    var i = 0
    while (i <= toks.length - n) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, i, parts, 0, n)
      counts.merge(UTF8String.concatWs(SPACE, parts: _*), 1, Integer.sum)
      i += 1
    }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue.toLong))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document gram counts for EVERY n in 1..maxN from a single
    * tokenize pass: `array<struct(n, gram, cnt)>`, strict windows and
    * first-occurrence order per n — each n-slice is element-identical to
    * [[gramCounts]] at that n (pinned by spec). Exists so a corpus LM fit
    * needs ONE scan for its unigram AND bigram tables instead of one scan
    * per order — at 100 TB that halves the fit's corpus reads.
    */
  def multiGramCounts(text: UTF8String, maxN: Int): ArrayData =
    multiGramCounts(text, 1, maxN)

  /** [[multiGramCounts]] restricted to orders minN..maxN — the order-n
    * LM fit only consumes the (order−1, order) tables, and emitting the
    * sub-context orders just to filter them out again is a third of the
    * fit kernel's row churn at order 3.
    */
  def multiGramCounts(text: UTF8String, minN: Int, maxN: Int): ArrayData = {
    val toks = tokenize(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var n = math.max(minN, 1)
    while (n <= maxN) {
      if (toks.length >= n) {
        val counts = new java.util.LinkedHashMap[UTF8String, Int](toks.length * 2)
        var i = 0
        while (i <= toks.length - n) {
          if (n == 1) counts.merge(toks(i), 1, Integer.sum)
          else {
            val parts = new Array[UTF8String](n)
            System.arraycopy(toks, i, parts, 0, n)
            counts.merge(UTF8String.concatWs(SPACE, parts: _*), 1, Integer.sum)
          }
          i += 1
        }
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](n, e.getKey, e.getValue.toLong))
        }
      }
      n += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Fused shingle-set Jaccard: |A∩B| / (|A|+|B|-|A∩B|) in ONE pass over
    * both texts — bit-identical to
    * `size(array_intersect(sh_a, sh_b)) / (size(sh_a)+size(sh_b)-inter)`
    * over [[compute]] outputs (same set construction, integer arithmetic,
    * single double division).
    *
    * Exists as a kernel because the composed form is catastrophically
    * duplication-sensitive: Catalyst's project collapse + filter pushdown
    * inline the shingle/intersect subtrees into join conditions AND output
    * projections (no common-subexpression elimination across a join
    * condition), re-shingling each candidate pair up to ~8×. A single
    * scalar expression is evaluated at most once per site.
    */
  def jaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size.toDouble + sb.size.toDouble - inter.toDouble)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING and n > 0, got ${child.dataType.simpleString} / $n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordShinglesKernel.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordShinglesKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.compute($a, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  def ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))

  def shingleJaccard(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), n))

  def repetitionStats(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text), n))

  def termCounts(text: Column): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(text)))

  def gramCounts(text: Column, n: Int): Column =
    ColumnBridge.column(GramCounts(ColumnBridge.expression(text), n))

  def multiGramCounts(text: Column, maxN: Int): Column =
    ColumnBridge.column(MultiGramCounts(ColumnBridge.expression(text), maxN))

  def multiGramCounts(text: Column, minN: Int, maxN: Int): Column =
    ColumnBridge.column(
      MultiGramCounts(ColumnBridge.expression(text), maxN, minN))
}

/** All-orders-at-once gram counts ([[WordShinglesKernel.multiGramCounts]])
  * — one tokenize pass per document for every n in 1..maxN. The fit-side
  * kernel that lets [[graft.ml.NgramLm.fit]] build its unigram and bigram
  * tables from a SINGLE corpus scan.
  */
case class MultiGramCounts(child: Expression, maxN: Int,
                           minN: Int = 1) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if maxN > 0 && minN >= 1 && minN <= maxN =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"multi_gram_counts requires STRING and 1 <= minN <= maxN, " +
        s"got ${t.simpleString} / $minN..$maxN")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordShinglesKernel.multiGramCounts(v.asInstanceOf[UTF8String], minN, maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordShinglesKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.multiGramCounts($a, $minN, $maxN);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiGramCounts =
    copy(child = newChild)
}

/** Per-document strict-window n-gram counts
  * ([[WordShinglesKernel.gramCounts]]) — the fused fit-side kernel for
  * corpus language models: one local map pass per document, one shuffled
  * row per distinct gram per document.
  */
case class GramCounts(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_counts requires STRING and n > 0, got ${t.simpleString} / $n")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordShinglesKernel.gramCounts(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordShinglesKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.gramCounts($a, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramCounts =
    copy(child = newChild)
}

/** Per-document term frequencies as one fused kernel
  * ([[WordShinglesKernel.termCounts]]): `array<struct(term, tf)>` per text.
  * Lets salient-terms build its tf table as a zero-shuffle
  * projection+explode instead of shuffling every token instance of the
  * corpus through a (doc, term) hash aggregation.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordShinglesKernel.termCounts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordShinglesKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.termCounts($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** Per-document Gopher repetition signals as one fused scalar kernel —
  * struct(n_grams, top_ngram_frac, distinct_frac) in a single pass over
  * the text ([[WordShinglesKernel.repetitionStats]]). Replaces an
  * explode + two-level hash aggregation: at corpus scale that shape
  * shuffled (id, 8-byte gram hash) pairs twice; this is a pure projection
  * inside whole-stage codegen with ZERO shuffle — per-document state is a
  * local gram→count map bounded by document length.
  */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires STRING and n > 0, got ${child.dataType.simpleString} / $n")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_ngram_frac", DoubleType, nullable = false),
    StructField("distinct_frac", DoubleType, nullable = false)))

  override def nullSafeEval(v: Any): Any =
    WordShinglesKernel.repetitionStats(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordShinglesKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.repetitionStats($a, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** All word n-grams with duplicates — [[WordShinglesKernel.computeAll]]. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires STRING and n > 0, got ${child.dataType.simpleString} / $n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordShinglesKernel.computeAll(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordShinglesKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.computeAll($a, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** See [[WordShinglesKernel.jaccard]]: the near-dup verify metric as one
  * codegen'd scalar, so per-pair cost is a single fused pass regardless of
  * how many plan sites Catalyst copies the expression into.
  */
case class ShingleJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if n > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"shingle_jaccard requires (STRING, STRING) and n > 0, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString}) / $n")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    WordShinglesKernel.jaccard(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordShinglesKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernel.jaccard($a, $b, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleJaccard =
    copy(left = newLeft, right = newRight)
}
