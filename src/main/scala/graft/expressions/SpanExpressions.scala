package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document kernels for the ExactSubstr span family
  * ([[graft.operators.Dedup.duplicatedSpans]] and friends, Lee et al.
  * 2021; reference analogue: the corpus-suffix-array dedup the tile
  * pipeline's text extension calls for). Both kernels consume the
  * per-document SORTED list of flagged k-token window positions (one
  * bounded array per document — the aggregate of the fingerprint
  * semi-join) and do the island merge / cover removal in one local pass,
  * replacing the composed plan's per-window window-functions and
  * per-TOKEN posexplode → anti-join → collect_list rebuild. The composed
  * forms survive as `private[graft]` spec pins in Dedup
  * (DedupSpec asserts bit-equality on the edge cases: irregular
  * whitespace, short-doc clamp, full cover, no cover).
  */
object SpanExpressions {

  def spanIslands(positions: Column, nw: Column, k: Int): Column =
    ColumnBridge.column(SpanIslands(
      ColumnBridge.expression(positions), ColumnBridge.expression(nw), k))

  def spanKeep(text: Column, positions: Column, k: Int): Column =
    ColumnBridge.column(SpanKeep(
      ColumnBridge.expression(text), ColumnBridge.expression(positions), k))
}

/** Maximal duplicated-span islands from one document's sorted flagged
  * window positions: positions p < p' with p' − p <= k merge (their
  * k-token covers overlap or touch); each island reports
  * (span_start, span_end, span_tokens, n_windows) with span_end clamped
  * to the document's last token `nw − 1` (the short-doc whole-document
  * window collapses past the text end otherwise).
  */
case class SpanIslands(left: Expression, right: Expression,
                       k: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) if k >= 2 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"span_islands requires (ARRAY<BIGINT>, BIGINT) and k >= 2, " +
          s"got ${l.simpleString(10)} / ${r.simpleString(10)} / k=$k")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("span_start", LongType, nullable = false),
    StructField("span_end", LongType, nullable = false),
    StructField("span_tokens", LongType, nullable = false),
    StructField("n_windows", LongType, nullable = false))),
    containsNull = false)

  def islands(positions: ArrayData, nw: Long): ArrayData = {
    val ps = positions.toLongArray()
    if (ps.length == 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new java.util.ArrayList[AnyRef](4)
    var start = ps(0)
    var last = ps(0)
    var n = 1L
    def emit(): Unit = {
      val end = math.min(last + (k - 1).toLong, nw - 1L)
      out.add(new GenericInternalRow(
        Array[Any](start, end, end - start + 1L, n)))
    }
    var i = 1
    while (i < ps.length) {
      if (ps(i) - last > k.toLong) { emit(); start = ps(i); n = 0L }
      last = ps(i)
      n += 1L
      i += 1
    }
    emit()
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(p: Any, n: Any): Any =
    islands(p.asInstanceOf[ArrayData], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanIslands", this,
      classOf[SpanIslands].getName)
    nullSafeCodeGen(ctx, ev, (p, n) => s"${ev.value} = $ref.islands($p, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanIslands =
    copy(left = newLeft, right = newRight)
}

/** Span-cover removal for one document: tokenize (the family's ONE
  * tokenization — [[WordShinglesKernel.tokenize]], trim + split on
  * `\s+`, identical to the windows' grams), mark every token covered by
  * a flagged window `[p, p + k − 1]` (clamped to the text), and rejoin
  * the survivors with single spaces. Returns struct(kept, n_kept, nw) —
  * the caller derives n_removed = nw − n_kept, and the left-join null
  * discipline (docs with no flagged windows / null text) stays in the
  * plan where the composed form kept it.
  */
case class SpanKeep(left: Expression, right: Expression,
                    k: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) if k >= 2 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"span_keep requires (STRING, ARRAY<BIGINT>) and k >= 2, " +
          s"got ${l.simpleString(10)} / ${r.simpleString(10)} / k=$k")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("kept", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("nw", LongType, nullable = false)))

  def keep(text: UTF8String, positions: ArrayData): InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    val nw = toks.length
    val ps = positions.toLongArray()
    val covered = new Array[Boolean](nw)
    var i = 0
    while (i < ps.length) {
      // window positions come from the same text, so p is in range by
      // construction; clamp anyway — a foreign span table must not crash.
      // The clamp stays in LONG space on both ends (a raw .toInt of a
      // position past Int.MaxValue would wrap negative and index out)
      var j = math.min(math.max(ps(i), 0L), nw.toLong).toInt
      val hi = math.min(ps(i) + (k - 1).toLong, nw - 1L)
      while (j <= hi) { covered(j) = true; j += 1 }
      i += 1
    }
    var nKept = 0
    i = 0
    while (i < nw) { if (!covered(i)) nKept += 1; i += 1 }
    val keptArr = new Array[UTF8String](nKept)
    var o = 0
    i = 0
    while (i < nw) {
      if (!covered(i)) { keptArr(o) = toks(i); o += 1 }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.concatWs(WordShinglesKernel.SpaceSep, keptArr: _*),
      nKept.toLong, nw.toLong))
  }

  override def nullSafeEval(t: Any, p: Any): Any =
    keep(t.asInstanceOf[UTF8String], p.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanKeep", this, classOf[SpanKeep].getName)
    nullSafeCodeGen(ctx, ev, (t, p) => s"${ev.value} = $ref.keep($t, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanKeep =
    copy(left = newLeft, right = newRight)
}
