package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Hyperplane-component tables for sign-random-projection signatures.
  *
  * Component (p, j) is hash-derived in [-0.5, 0.5):
  * `pmod(xxhash64(p:int, j:int, seed:long), 1e6) / 1e6 - 0.5` — exactly the
  * fold Spark's `xxhash64` performs over an (int, int, long) child list
  * (seed 42, hashInt → hashInt → hashLong), so signatures are bit-identical
  * to the composable `aggregate`/`zip_with` formulation (pinned by
  * SimilaritySpec) and reproducible across runs/engines — no RNG.
  *
  * The table depends only on (planes, seed, dim) — NOT on the row — so it is
  * computed once per JVM per (planes, seed) and grown monotonically to the
  * largest dimension seen; per-row work is then a pure multiply-accumulate
  * over primitives.
  */
object SrpPlanes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Double]]()
  // backstop for pathological many-seed usage (multi-table LSH with
  // hundreds of seeds): past this many (planes, seed) keys the cache is
  // cleared rather than retaining dim*planes*8 bytes per key forever
  private val MaxEntries = 64

  /** Component table, j-major: `tab(j * planes + p)`; grows on demand.
    * Growth to a larger dim arraycopies the existing table (its values are
    * exactly the new table's prefix in j-major layout) and only computes
    * the new j-blocks.
    */
  def table(planes: Int, seed: Long, dim: Int): Array[Double] = {
    val key = (planes, seed)
    val cur = cache.get(key)
    if (cur != null && cur.length >= dim * planes) return cur
    cache.synchronized {
      val again = cache.get(key)
      if (again != null && again.length >= dim * planes) return again
      val tab = new Array[Double](dim * planes)
      val start =
        if (again != null) { System.arraycopy(again, 0, tab, 0, again.length)
          again.length / planes }
        else 0
      val hp = Array.tabulate(planes)(p => XXH64.hashInt(p, 42L))
      var j = start
      while (j < dim) {
        var p = 0
        while (p < planes) {
          val h = XXH64.hashLong(seed, XXH64.hashInt(j, hp(p)))
          val m = h % 1000000L
          val pm = if (m < 0) m + 1000000L else m
          tab(j * planes + p) = pm.toDouble / 1000000.0 - 0.5
          p += 1
        }
        j += 1
      }
      if (cache.size >= MaxEntries) cache.clear()
      cache.put(key, tab)
      tab
    }
  }
}

/** Native codegen'd sign-random-projection signature over `ARRAY<FLOAT>` /
  * `ARRAY<DOUBLE>`: bit p of the result is `sign(v · plane_p)`.
  *
  * Why native: the composable form evaluates `aggregate`/`zip_with` lambdas
  * interpreted — O(planes × dim) InternalRow projections per row, each
  * re-hashing the (row-independent!) plane component — and breaks
  * whole-stage codegen for the surrounding scan. This kernel reads the
  * cached plane table and runs a tight primitive multiply-accumulate loop
  * inside codegen: signature at scan speed, the same 100×-class win already
  * measured for MinHash/SimHash (PERF.md).
  *
  * Contract (bit-identical to the lambda form on non-null inputs, pinned by
  * SimilaritySpec): per-plane projection folds elements in ascending index
  * order in double arithmetic; an empty array and a null element both yield
  * signature 0 (in the lambda form `zip_with`'s null padding / the null
  * element poison the fold, and the when-chain maps the null projection to
  * bit 0). A null array is null (the lambda form gives 0 there — callers
  * never bucket null embeddings).
  */
case class SrpSignature(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if planes > 0 && planes <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"srp_signature requires ARRAY<FLOAT|DOUBLE> and 0 < planes <= 64, " +
        s"got ${child.dataType.simpleString} / $planes")
  }

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return 0L
    val tab = SrpPlanes.table(planes, seed, n)
    val proj = new Array[Double](planes)
    val f = isFloat
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return 0L
      val x = if (f) a.getFloat(j).toDouble else a.getDouble(j)
      val base = j * planes
      var p = 0
      while (p < planes) { proj(p) += x * tab(base + p); p += 1 }
      j += 1
    }
    var out = 0L
    var p = 0
    while (p < planes) { if (proj(p) >= 0) out |= (1L << p); p += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesCls = SrpPlanes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tabRef = ctx.addMutableState("double[]", "srpTab",
      forceInline = true, useFreshName = true)
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val proj = ctx.freshName("proj")
      val x = ctx.freshName("x"); val base = ctx.freshName("base")
      val out = ctx.freshName("out"); val poisoned = ctx.freshName("poisoned")
      s"""
         |final int $n = $a.numElements();
         |if ($n > 0 && ($tabRef == null || $tabRef.length < $n * $planes)) {
         |  $tabRef = $planesCls.table($planes, ${seed}L, $n);
         |}
         |final double[] $proj = new double[$planes];
         |boolean $poisoned = ($n == 0);
         |for (int $j = 0; $j < $n && !$poisoned; $j++) {
         |  if ($a.isNullAt($j)) { $poisoned = true; break; }
         |  final double $x = (double) $a.$get($j);
         |  final int $base = $j * $planes;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    $proj[$p] += $x * $tabRef[$base + $p];
         |  }
         |}
         |long $out = 0L;
         |if (!$poisoned) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    if ($proj[$p] >= 0) $out |= (1L << $p);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpExpressions {
  /** Column-level native SRP signature (see [[SrpSignature]]). */
  def srpSig(v: Column, planes: Int, seed: Long = 42L): Column =
    ColumnBridge.column(SrpSignature(ColumnBridge.expression(v), planes, seed))
}
