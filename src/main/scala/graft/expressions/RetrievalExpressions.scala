package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document BM25 term statistics as ONE fused scalar kernel:
  * struct(dl, tf[]) — document length in tokens plus the term frequency of
  * every query term — in a single tokenize pass (the RepetitionStats
  * pattern). The query's term list is tiny and rides the expression; each
  * task builds its term→slot map once, lazily. This replaces the composed
  * explode → filter-to-query-terms → per-(doc, term) aggregation plan,
  * whose per-occurrence shuffle rows are pure waste when the downstream
  * consumer only needs one bounded vector per document.
  */
case class Bm25TermStats(child: Expression,
                         terms: Array[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if terms.nonEmpty && terms.distinct.length == terms.length =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bm25_term_stats requires STRING and a non-empty distinct term list, " +
        s"got ${t.simpleString} / ${terms.length} terms")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tf", ArrayType(LongType, containsNull = false),
      nullable = false)))

  @transient private lazy val slot: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  def stats(text: UTF8String): InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    val tf = new Array[Long](terms.length)
    var i = 0
    while (i < toks.length) {
      val s = slot.get(toks(i))
      if (s != null) tf(s.intValue()) += 1L
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length.toLong,
      new GenericArrayData(tf)))
  }

  override def nullSafeEval(v: Any): Any = stats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25Stats", this,
      classOf[Bm25TermStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.stats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Bm25TermStats =
    copy(child = newChild)
}

object Bm25TermStats {
  def apply(text: Column, terms: Array[String]): Column =
    ColumnBridge.column(
      new Bm25TermStats(ColumnBridge.expression(text), terms))
}
