package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

  /** Residual sub-distance (the IVFADC chain, Jégou et al. 2011 §IV):
    * fixed-point squared-L2 between the RESIDUAL `vec[off ..] − coarse[
    * coarseOff ..]` and a codebook centroid. EXACT op order shared with
    * the q6h SQL oracle: cast-to-double, subtract the coarse component,
    * subtract the codebook component, square, ×1e9, half-up round,
    * integer sum — each subtraction is one IEEE op, so the chain replays
    * bit-for-bit cross-engine.
    */
  def residSubDist(vec: ArrayData, off: Int, isFloat: Boolean,
                   coarse: Array[Double], coarseOff: Int,
                   centroid: Array[Double]): Long = {
    var s = 0L
    var i = 0
    while (i < centroid.length) {
      val a = if (isFloat) vec.getFloat(off + i).toDouble
              else vec.getDouble(off + i)
      val d = (a - coarse(coarseOff + i)) - centroid(i)
      s += BigramLmScore.halfUp(1e9 * (d * d))
      i += 1
    }
    s
  }

  /** Driver-local twin of [[subDist]] over plain arrays — the fit-time
    * cell assignment for sample residuals must replay the kernel's exact
    * chain, or fitted codebooks would be trained against a different
    * partition of the sample than the one search uses.
    */
  def subDistLocal(a: Array[Double], c: Array[Double]): Long = {
    var s = 0L
    var i = 0
    while (i < c.length) {
      val d = a(i) - c(i)
      s += BigramLmScore.halfUp(1e9 * (d * d))
      i += 1
    }
    s
  }

  /** Fixed-point argmin cell over a full-vector codebook (driver-local),
    * ties to the lowest id — the [[PqEncode]] assignment rule.
    */
  def nearestCellLocal(v: Array[Double], cells: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cells.length) {
      val d = subDistLocal(v, cells(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
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

/** Fixed-point squared-L2 between two full vectors: Σ_i round(1e9 ·
  * (a_i − b_i)²) — the [[PqKernel.subDist]] grid applied to a column
  * pair instead of a rides-the-expression codebook. Used for the
  * IVF-PQ query→coarse-centroid probe ranking (the centroid table is a
  * broadcast DF, so the right side arrives as a column); integer and
  * order-free, so the probe set replays exactly in SQL. Length
  * mismatch → null (the VecDot contract).
  */
case class FpSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, r) if PqKernel.vecArrayOk(l) && PqKernel.vecArrayOk(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fp_sq_dist requires two ARRAY<FLOAT|DOUBLE>, " +
          s"got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val lFloat = PqKernel.isFloatArray(left.dataType)
  @transient private lazy val rFloat = PqKernel.isFloatArray(right.dataType)

  def dist(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = av.numElements()
    if (n != bv.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      val x = if (lFloat) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (rFloat) bv.getFloat(i).toDouble else bv.getDouble(i)
      val d = x - y
      s += BigramLmScore.halfUp(1e9 * (d * d))
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any = dist(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fpSq", this, classOf[FpSqDist].getName)
    val r = ctx.freshName("fpSqRes")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""Object $r = $ref.dist($a, $b);
         |${ev.isNull} = $r == null;
         |if (!${ev.isNull}) ${ev.value} = ((java.lang.Long) $r).longValue();
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FpSqDist =
    copy(left = newLeft, right = newRight)
}

object FpSqDist {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new FpSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** IVF-PQ encode (the FAISS IVFADC corpus pass, Jégou et al. 2011 §IV):
  * vector → (coarse cell, m residual codes) in ONE fused kernel —
  * cell is the fixed-point argmin over the coarse codebook (ties to
  * the lowest id, the [[PqEncode]] rule), codes_j the argmin of the
  * RESIDUAL sub-distance over subspace j's codebook
  * ([[PqKernel.residSubDist]]). The residual never materializes: each
  * candidate distance folds the coarse subtraction into its chain, so
  * the corpus pass stays a pure projection. Null vector or geometry
  * mismatch → null.
  */
case class IvfPqEncode(child: Expression,
                       coarse: Seq[Seq[Double]],
                       codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case dt if PqKernel.vecArrayOk(dt) && coarse.nonEmpty &&
        codebooks.nonEmpty &&
        coarse.forall(_.size == coarse.head.size) &&
        codebooks.forall(cb => cb.nonEmpty &&
          cb.forall(_.size == codebooks.head.head.size)) &&
        coarse.head.size == codebooks.size * codebooks.head.head.size =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivfpq_encode requires ARRAY<FLOAT|DOUBLE>, a rectangular coarse " +
        s"codebook, and subspaces covering the coarse dim, got " +
        s"${t.simpleString} / ${coarse.size} cells / ${codebooks.size} subspaces")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val cells: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val ds: Int = cbs(0)(0).length
  @transient private lazy val isFloat: Boolean =
    PqKernel.isFloatArray(child.dataType)

  def encode(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val m = cbs.length
    if (vec.numElements() != m * ds) return null
    // coarse cell: full-vector fixed-point argmin, ties to the low id
    var cell = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cells.length) {
      val d = PqKernel.subDist(vec, 0, isFloat, cells(c))
      if (d < bestD) { bestD = d; cell = c }
      c += 1
    }
    val cc = cells(cell)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      var best = 0
      var bd = Long.MaxValue
      var i = 0
      while (i < cb.length) {
        val d = PqKernel.residSubDist(vec, j * ds, isFloat, cc, j * ds, cb(i))
        if (d < bd) { bd = d; best = i }
        i += 1
      }
      codes(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(cell,
      new GenericArrayData(codes))
  }

  override def nullSafeEval(v: Any): Any = encode(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfpqEnc", this, classOf[IvfPqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $ref.encode($a);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfPqEncode =
    copy(child = newChild)
}

object IvfPqEncode {
  def apply(vec: Column, coarse: Seq[Seq[Double]],
            codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(
      new IvfPqEncode(ColumnBridge.expression(vec), coarse, codebooks))
}

/** IVF-PQ asymmetric distance: (codes, query, cell) → the exact integer
  * ADC total Σ_j residSubDist(query_j − coarse[cell]_j, centroid_j[
  * code_j]) — the query's residual against the probed cell folds into
  * each subspace chain exactly as the corpus encode did. Null on any
  * side or geometry mismatch → null.
  */
case class IvfPqAdcDist(first: Expression, second: Expression,
                        third: Expression,
                        coarse: Seq[Seq[Double]],
                        codebooks: Seq[Seq[Seq[Double]]])
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), dt, IntegerType)
          if PqKernel.vecArrayOk(dt) && coarse.nonEmpty && codebooks.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"ivfpq_adc_dist requires (ARRAY<INT>, ARRAY<FLOAT|DOUBLE>, INT), " +
          s"got ${a.simpleString} / ${b.simpleString} / ${c.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val cells: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val ds: Int = cbs(0)(0).length
  @transient private lazy val qIsFloat: Boolean =
    PqKernel.isFloatArray(second.dataType)

  def dist(c: Any, q: Any, cellA: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val qv = q.asInstanceOf[ArrayData]
    val cell = cellA.asInstanceOf[Int]
    val m = cbs.length
    if (codes.numElements() != m || qv.numElements() != m * ds ||
        cell < 0 || cell >= cells.length) return null
    val cc = cells(cell)
    var s = 0L
    var j = 0
    while (j < m) {
      val cid = codes.getInt(j)
      if (cid < 0 || cid >= cbs(j).length) return null
      s += PqKernel.residSubDist(qv, j * ds, qIsFloat, cc, j * ds, cbs(j)(cid))
      j += 1
    }
    s
  }

  override def nullSafeEval(c: Any, q: Any, cell: Any): Any = dist(c, q, cell)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfpqAdc", this, classOf[IvfPqAdcDist].getName)
    val r = ctx.freshName("ivfpqAdcRes")
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""Object $r = $ref.dist($a, $b, (java.lang.Integer) (Object) $c);
         |${ev.isNull} = $r == null;
         |if (!${ev.isNull}) ${ev.value} = ((java.lang.Long) $r).longValue();
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): IvfPqAdcDist =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object IvfPqAdcDist {
  def apply(codes: Column, query: Column, cell: Column,
            coarse: Seq[Seq[Double]],
            codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(new IvfPqAdcDist(
      ColumnBridge.expression(codes), ColumnBridge.expression(query),
      ColumnBridge.expression(cell), coarse, codebooks))
}
