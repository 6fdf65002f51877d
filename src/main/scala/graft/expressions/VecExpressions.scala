package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>`
  * columns — the hot kernel of every similarity/ANN operator.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express the same
  * computation but evaluate their lambdas interpreted (one `InternalRow`
  * projection per element), which is ~100x slower per pair and breaks
  * whole-stage codegen for the surrounding join. This expression generates a
  * tight primitive loop (`double += a[i]*b[i]`) inside the join's codegen
  * stage instead. Accumulation is in double regardless of element type, so
  * results match DuckDB's `list_cosine_similarity(CAST(... AS DOUBLE[]))`
  * oracle arithmetic.
  *
  * Null contract: null array -> null (nullSafe); MISMATCHED LENGTHS -> null
  * (a truncated partial dot product would be a plausible-looking wrong
  * answer, and DuckDB's `list_cosine_similarity` oracle raises on mismatch —
  * null surfaces the upstream bug instead of hiding it); a null ELEMENT in
  * either array skips that index pair entirely (contributes nothing — in
  * particular it can NOT poison the sum by pairing with NaN/Infinity on the
  * other side; eval and codegen implement the identical skip).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      // same skip shape as the generated code: BOTH elements non-null, or
      // the pair contributes nothing (0.0 * NaN would poison the sum)
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $s += ${get(a, isFloat(left))} * ${get(b, isFloat(right))};
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Column-level native dot product (see [[VecDot]]). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
