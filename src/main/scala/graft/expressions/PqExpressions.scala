package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011 — the FAISS PQ/ADC
  * shape) over a FIXED-POINT distance grid: the per-subspace squared-L2
  * distance is Σ_i round(1e9 · (a_i − c_i)²) — every per-dimension term
  * rounds to an exact nano-unit LONG before the sum, so sub-distances,
  * code assignments (argmin, ties to the lowest centroid id), and ADC
  * totals are pure integer arithmetic any ANSI engine replays bit-for-bit
  * (the LM-score contract applied to geometry). The tiny codebook
  * (m × k × ds doubles) rides the expressions.
  */
object PqKernel {
  /** Fixed-point squared-L2 between `vec[off .. off+ds)` and a centroid.
    * EXACT op order shared with the q5y SQL oracle: cast-to-double,
    * subtract, square, ×1e9, half-up round, integer sum.
    */
  def subDist(vec: ArrayData, off: Int, isFloat: Boolean,
              centroid: Array[Double]): Long = {
    var s = 0L
    var i = 0
    while (i < centroid.length) {
      val a = if (isFloat) vec.getFloat(off + i).toDouble
              else vec.getDouble(off + i)
      val d = a - centroid(i)
      s += BigramLmScore.halfUp(1e9 * (d * d))
      i += 1
    }
    s
  }

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def vecArrayOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** PQ encode: vector → m centroid ids (one per subspace), each the argmin
  * of the fixed-point sub-distance over that subspace's codebook, ties to
  * the lowest id. Null vector or a length that doesn't match the codebook
  * geometry → null (the VecDot mismatch contract — a silently truncated
  * code would be a plausible-looking wrong answer).
  */
case class PqEncode(child: Expression,
                    codebooks: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case dt if PqKernel.vecArrayOk(dt) && codebooks.nonEmpty &&
        codebooks.forall(cb => cb.nonEmpty &&
          cb.forall(_.size == codebooks.head.head.size)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<FLOAT|DOUBLE> and a rectangular codebook, " +
        s"got ${t.simpleString} / ${codebooks.size} subspaces")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val ds: Int = cbs(0)(0).length
  @transient private lazy val isFloat: Boolean =
    PqKernel.isFloatArray(child.dataType)

  def encode(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val m = cbs.length
    if (vec.numElements() != m * ds) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cb.length) {
        val d = PqKernel.subDist(vec, j * ds, isFloat, cb(c))
        if (d < bestD) { bestD = d; best = c } // strict < : ties keep low id
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = encode(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.encode($a);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(
      new PqEncode(ColumnBridge.expression(vec), codebooks))
}

/** Asymmetric-distance computation: codes (left) vs a raw query vector
  * (right) → the exact integer ADC total Σ_j subDist(query_j,
  * centroid_j[code_j]). Null on either side, or geometry mismatch → null.
  */
case class PqAdcDist(left: Expression, right: Expression,
                     codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), dt) if PqKernel.vecArrayOk(dt) &&
          codebooks.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dist requires (ARRAY<INT>, ARRAY<FLOAT|DOUBLE>), " +
          s"got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val ds: Int = cbs(0)(0).length
  @transient private lazy val qIsFloat: Boolean =
    PqKernel.isFloatArray(right.dataType)

  def dist(c: Any, q: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val qv = q.asInstanceOf[ArrayData]
    val m = cbs.length
    if (codes.numElements() != m || qv.numElements() != m * ds) return null
    var s = 0L
    var j = 0
    while (j < m) {
      val cid = codes.getInt(j)
      if (cid < 0 || cid >= cbs(j).length) return null
      s += PqKernel.subDist(qv, j * ds, qIsFloat, cbs(j)(cid))
      j += 1
    }
    s
  }

  override def nullSafeEval(c: Any, q: Any): Any = dist(c, q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDist].getName)
    // freshName: a fixed local would collide if two PqAdcDist instances
    // land in one codegen stage (Janino would fail the whole stage to
    // the interpreted path, silently)
    val r = ctx.freshName("pqAdcRes")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""Object $r = $ref.dist($a, $b);
         |${ev.isNull} = $r == null;
         |if (!${ev.isNull}) ${ev.value} = ((java.lang.Long) $r).longValue();
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(left = newLeft, right = newRight)
}

object PqAdcDist {
  def apply(codes: Column, query: Column,
            codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(new PqAdcDist(
      ColumnBridge.expression(codes), ColumnBridge.expression(query),
      codebooks))
}
