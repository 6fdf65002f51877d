package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd hash-sketch kernels over token/shingle arrays.
  *
  * Why native: the composable formulations (`transform`/`aggregate` lambdas,
  * or explode + hash-aggregate) either interpret per element or shuffle
  * numDocs × numHashes longs. These expressions compute a whole signature
  * per row inside whole-stage codegen — dedup sketching at scan speed with
  * ZERO shuffle, the shape that holds at 100 TB.
  *
  * Bit-compatibility: Spark's `xxhash64(s, lit(i))` folds children through
  * XXH64 starting from seed 42 — `hashInt(i, hashUTF8String(s, 42))` (the
  * literal is an Int, so the fold step is hashInt). Both
  * kernels replicate that exactly (pinned by DedupSpec equality tests), and
  * additionally hash each string ONCE, reusing it across all hash functions
  * (the expression form re-hashes the string per function).
  */

/** MinHash signature: `array(min_j hashInt(i, h0_j))_i` for i < numHashes
  * over the element hashes h0_j. Null elements hash like `xxhash64(null, i)`
  * (hash skipped, fold continues from the seed); an empty array yields a
  * null signature.
  *
  * Null-ARRAY contract (intentional divergence from the pinned expression
  * form, which emits an array of nulls for null text): the kernel returns
  * NULL, so null-text docs produce null band keys and silently drop out of
  * LSH bucketing instead of all colliding in one degenerate bucket. The
  * DedupSpec bit-equality pin covers non-null inputs only.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires ARRAY<STRING> and numHashes > 0, got " +
        s"${child.dataType.simpleString} / $numHashes")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h0 = if (a.isNullAt(j)) 42L
               else XXH64.hashUTF8String(a.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, h0)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val mins = ctx.freshName("mins")
      val h0 = ctx.freshName("h0"); val h = ctx.freshName("h")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $h0 = $a.isNullAt($j) ? 42L
         |      : $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final long $h = $xxh.hashInt($i, $h0);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash: bit j of the result is the sign of
  * Σ_elements (bit j of xxhash64(element) ? +1 : -1) — bit-identical to the
  * `aggregate`-lambda formulation (non-null inputs), one string hash per
  * element.
  *
  * Null-ARRAY contract (intentional divergence from the pinned lambda form,
  * which folds null text to 0L): the kernel returns NULL, so null-text docs
  * drop out of simhash band-joins instead of all clustering at signature 0
  * — the same carve-out SrpSignature documents.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = if (a.isNullAt(j)) 42L
              else XXH64.hashUTF8String(a.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val votes = ctx.freshName("votes")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $a.isNullAt($j) ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object HashSketchExpressions {
  /** Column-level MinHash signature (see [[MinHashSignature]]). */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes))

  /** Column-level SimHash (see [[SimHash64]]). */
  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
