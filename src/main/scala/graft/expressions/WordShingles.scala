package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  private val WS: UTF8String = UTF8String.fromString("\\s+")
  private val SPACE: UTF8String = UTF8String.fromString(" ")

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.trim().split(WS, -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length < n) {
      out.add(UTF8String.concatWs(SPACE, toks: _*))
    } else {
      var i = 0
      while (i <= toks.length - n) {
        val parts = new Array[UTF8String](n)
        System.arraycopy(toks, i, parts, 0, n)
        out.add(UTF8String.concatWs(SPACE, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
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
}
