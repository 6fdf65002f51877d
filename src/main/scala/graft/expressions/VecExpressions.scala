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

/** Nearest-centroid cell id for a vector against a FIXED centroid matrix:
  * `argmin_i (|c_i|² − 2·v·c_i)` (the L2 argmin with the |v|² term dropped —
  * constant per row), ties to the LOWEST cell id.
  *
  * This replaces the unrolled form (one VecDot-vs-literal column per
  * centroid + `least` + a when-chain): at nCentroids × dim ≈ 64 × 64 that
  * expands past Janino's 64 KB method limit, silently dropping the whole
  * stage to interpreted evaluation — the exact failure the expression
  * class exists to avoid. Here the matrix is a codegen REFERENCE OBJECT
  * and the generated code is two fixed-size loops: code size O(1) in the
  * centroid count, arithmetic identical to the unrolled chain (same
  * `c2 - 2*dot` per cell, same strict `<` giving first-wins = lowest id).
  *
  * Null contract: null vector → null; a LENGTH MISMATCH with the centroid
  * dim → null (VecDot's rule: surface the upstream bug, don't truncate);
  * null ELEMENTS skip their index pair, matching VecDot.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty && centroids.forall(_.size == centroids.head.size),
    "NearestCentroid needs >= 1 equal-dimension centroids")

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val c2: Array[Double] =
    matrix.map(c => c.map(x => x * x).sum)
  private def dim: Int = centroids.head.size

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var best = -1
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < matrix.length) {
      val ctr = matrix(i)
      var s = 0.0
      var j = 0
      while (j < dim) {
        if (!v.isNullAt(j)) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          s += x * ctr(j)
        }
        j += 1
      }
      val d = c2(i) - 2.0 * s
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
      val cc = ctx.addReferenceObj("centroidNorms", c2, "double[]")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val ctr = ctx.freshName("ctr")
      val getter = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $i = 0; $i < ${matrix.length}; $i++) {
         |    double $s = 0.0;
         |    final double[] $ctr = $m[$i];
         |    for (int $j = 0; $j < $dim; $j++) {
         |      if (!$a.isNullAt($j)) { $s += $getter * $ctr[$j]; }
         |    }
         |    final double $d = $cc[$i] - 2.0 * $s;
         |    if ($d < $bestD) { $bestD = $d; $best = $i; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object VecExpressions {
  /** Column-level native dot product (see [[VecDot]]). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level nearest-centroid cell id (see [[NearestCentroid]]). */
  def nearestCentroidCell(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expression(v), centroids))
}
