package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable md5-60-bit bucket as ONE fused kernel:
  * bucket = (first 60 bits of md5(s)) mod `buckets` — BIT-IDENTICAL to
  * the composed form `pmod(conv(substring(md5(s), 1, 15), 16, 10), k)`
  * (the q47/q57 idiom; the first 15 hex chars ARE the first 60 digest
  * bits) and to DuckDB's `CAST('0x' || substr(md5(s),1,15) AS BIGINT)
  * % k`, but computed straight from the digest bytes — no hex string,
  * no base-conversion decimal string, no intermediate allocations. The
  * composed chain measured 3.2× behind the DuckDB twin on the DSIR
  * probe purely on that string churn.
  */
case class Md5Bucket(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if buckets > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_bucket requires STRING and buckets > 0, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  def bucket(s: Any): Long = {
    val md = Md5Bucket.digest.get()
    md.reset()
    md.update(s.asInstanceOf[UTF8String].getBytes)
    Md5Bucket.bucketOfDigest(md, buckets)
  }

  override def nullSafeEval(s: Any): Any = bucket(s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5bk", this, classOf[Md5Bucket].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.bucket($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Bucket =
    copy(child = newChild)
}

object Md5Bucket {
  private[expressions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 md5 bits as a Long — the house engine-portable hash VALUE
    * (`CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` on the oracle
    * side, `conv(substring(md5(s), 1, 15), 16, 10)` composed in Spark).
    * One definition shared by the bucketed forms and the KMV sketch
    * kernel, so no fused form can drift from the composed chain.
    */
  private[expressions] def value60OfDigest(
      md: java.security.MessageDigest): Long = {
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** First 60 md5 bits of `bytes` mod `buckets` — the shared arithmetic
    * of [[Md5Bucket]] and the fused feature kernels ([[DsirScore]]): one
    * definition, so the fused forms cannot drift from the composed one.
    */
  private[expressions] def bucketOfDigest(
      md: java.security.MessageDigest, buckets: Int): Long =
    java.lang.Long.remainderUnsigned(value60OfDigest(md), buckets.toLong)

  def apply(s: Column, buckets: Int): Column =
    ColumnBridge.column(new Md5Bucket(ColumnBridge.expression(s), buckets))
}

/** Whole-document DSIR importance weight as ONE fused scalar kernel (the
  * BigramLmScore treatment applied to [[graft.ml.Dsir]]): tokenize →
  * md5-bucket each unigram and adjacent bigram → sum the per-bucket
  * integer micro-nat deltas, in a single pass with no intermediate
  * feature/bucket/delta arrays.
  *
  * Bit-identical by construction to the composed projection
  * `aggregate(transform(features, f => element_at(deltas, md5_bucket(f)
  * + 1)), 0L, _+_)` (pinned by DsirSpec):
  *   - tokens: [[WordShinglesKernel.tokenize]] IS `split(trim(text),
  *     "\\s+")` (TextFunctionsSpec-pinned), including the single empty
  *     token a whitespace-only text produces;
  *   - bigram bytes: UTF-8 concatenation is byte concatenation, so
  *     digesting (a, ' ', b) in place equals hashing `concat(a, ' ', b)`
  *     without materializing the joined string;
  *   - bucket: [[Md5Bucket.bucketOfDigest]] — the one shared definition.
  *
  * The composed chain measured ~1.9× behind its DuckDB twin at 100×
  * (BENCH_100x r13) purely on per-feature array materialization: three
  * allocated arrays per document (tokens+bigrams, transformed deltas)
  * plus a per-feature UTF8String concat. The delta table rides the
  * serialized expression — bounded by the fit's bucket cap (≤ 65536
  * longs), the same reason the cap exists for 100 TB.
  */
case class DsirScore(child: Expression, deltaMicro: IndexedSeq[Long])
    extends UnaryExpression {

  // the delta table as a case-class field is an immutable IndexedSeq so
  // expression equality/hashCode compare CONTENTS — an Array field is
  // reference-compared, which defeats canonicalization and
  // common-subexpression elimination (two semantically identical
  // DsirScore expressions would never dedup). The eval/codegen hot loop
  // indexes a flat array, converted once per (de)serialized instance.
  @transient private lazy val deltaArr: Array[Long] = deltaMicro.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if deltaMicro.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dsir_score requires STRING and a non-empty delta table, " +
        s"got ${t.simpleString} / ${deltaMicro.length}")
  }

  override def dataType: DataType = LongType

  def score(text: UTF8String): Long = {
    val toks = WordShinglesKernel.tokenize(text)
    val deltas = deltaArr
    val buckets = deltas.length
    val md = Md5Bucket.digest.get()
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      md.reset()
      md.update(toks(i).getBytes)
      sum += deltas(Md5Bucket.bucketOfDigest(md, buckets).toInt)
      i += 1
    }
    i = 0
    while (i < toks.length - 1) {
      md.reset()
      md.update(toks(i).getBytes)
      md.update(' '.toByte)
      md.update(toks(i + 1).getBytes)
      sum += deltas(Md5Bucket.bucketOfDigest(md, buckets).toInt)
      i += 1
    }
    sum
  }

  override def nullSafeEval(s: Any): Any = score(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirKernel", this, classOf[DsirScore].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.score($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirScore {
  def apply(text: Column, deltaMicro: Seq[Long]): Column =
    ColumnBridge.column(
      new DsirScore(ColumnBridge.expression(text), deltaMicro.toIndexedSeq))
}

/** Whole-document hashed bag-of-tokens counts as ONE fused kernel — the
  * [[DsirScore]] treatment applied to the quality classifier's feature
  * build ([[graft.ml.TextClassifier.hashedFeatures]]): tokenize →
  * md5-bucket each token → increment a length-k count array, in a single
  * pass. The composed form it replaces ran k=64 separate
  * `size(filter(__bk, _ === j))` traversals over each document's bucket
  * array — 64 array walks plus the materialized bucket array per row,
  * the exact composed-chain shape the DSIR axis already measured ~2×
  * behind its twin before fusion.
  *
  * Bit-identical by construction to the composed chain (spec-pinned):
  *   - tokens: [[WordShinglesKernel.tokenize]] IS
  *     `split(trim(text), "\\s+")` (TextFunctionsSpec-pinned), including
  *     the single empty token a whitespace-only text produces;
  *   - bucket: [[Md5Bucket.bucketOfDigest]] — the one shared definition,
  *     so the fused counts cannot drift from the per-token kernel.
  *
  * Emits `array<long>` (element j = tokens in bucket j, never null); the
  * caller casts elements to double so the downstream PER-BUCKET float
  * margin chain keeps the exact op order the q57/q70 oracles spell — the
  * house constraint: fuse only the counting, never the float fold.
  */
case class Md5BucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if buckets > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_bucket_counts requires STRING and buckets > 0, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  def counts(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = WordShinglesKernel.tokenize(text)
    val md = Md5Bucket.digest.get()
    val c = new Array[Long](buckets)
    var i = 0
    while (i < toks.length) {
      md.reset()
      md.update(toks(i).getBytes)
      c(Md5Bucket.bucketOfDigest(md, buckets).toInt) += 1L
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(c)
  }

  override def nullSafeEval(s: Any): Any = counts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bkCounts", this,
      classOf[Md5BucketCounts].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.counts($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5BucketCounts =
    copy(child = newChild)
}

object Md5BucketCounts {
  def apply(text: Column, buckets: Int): Column =
    ColumnBridge.column(
      new Md5BucketCounts(ColumnBridge.expression(text), buckets))
}

/** The quality classifier's gate decision as ONE fused boolean kernel —
  * the BigramLmGate shape on the corpus-filter axis: the fitted
  * [[graft.ml.TextClassifier.LinearTextModel]] rides the expression as
  * literals (bounded by the fit's bucket cap, the BigramLmScore model
  * pattern), so a streaming ingest gate is a pure codegen'd filter with
  * zero joins and zero state-store state.
  *
  * keep ⇔ margin ≥ minMargin, where margin is EXACTLY the
  * [[graft.ml.TextClassifier.marginCol]] chain: counts from the one
  * shared tokenize/bucket arithmetic ([[Md5BucketCounts]]'s loop,
  * [[Md5Bucket.bucketOfDigest]]), then the left-associative
  * per-bucket fold `intercept + c_0·f_0 + c_1·f_1 + …` in ascending
  * bucket order — each step an IEEE double multiply-add in the same
  * order the Column chain and the q57/q70/q74 oracles spell, so the
  * kernel's decision is bit-identical to the composed scoring path
  * (TextClassifierSpec pins it row-for-row). The fold lives here (not
  * only in Column form) because a streaming filter must be one
  * self-contained predicate: a margin computed in a preceding
  * projection gets inlined into the pushed-down filter per f_j
  * reference, re-running the counting kernel k times per row.
  */
case class LinearTextGate(child: Expression,
                          coefficients: IndexedSeq[Double],
                          intercept: Double, minMargin: Double)
    extends UnaryExpression {

  @transient private lazy val coefArr: Array[Double] = coefficients.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if coefficients.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"linear_text_gate requires STRING and a non-empty coefficient " +
        s"table, got ${t.simpleString} / ${coefficients.length}")
  }

  override def dataType: DataType = BooleanType

  def keep(text: UTF8String): Boolean = {
    val coefs = coefArr
    val buckets = coefs.length
    val toks = WordShinglesKernel.tokenize(text)
    val md = Md5Bucket.digest.get()
    val counts = new Array[Long](buckets)
    var i = 0
    while (i < toks.length) {
      md.reset()
      md.update(toks(i).getBytes)
      counts(Md5Bucket.bucketOfDigest(md, buckets).toInt) += 1L
      i += 1
    }
    // the exact marginCol chain: ascending buckets, one multiply-add per
    // step, long count cast to double (both engines' exact widening)
    var margin = intercept
    var j = 0
    while (j < buckets) {
      margin = margin + coefs(j) * counts(j).toDouble
      j += 1
    }
    margin >= minMargin
  }

  override def nullSafeEval(s: Any): Any = keep(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ltGate", this, classOf[LinearTextGate].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.keep($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearTextGate =
    copy(child = newChild)
}

object LinearTextGate {
  def apply(text: Column, coefficients: Seq[Double], intercept: Double,
            minMargin: Double): Column =
    ColumnBridge.column(new LinearTextGate(ColumnBridge.expression(text),
      coefficients.toIndexedSeq, intercept, minMargin))
}

/** Per-document KMV partial sketch as ONE fused kernel — the
  * [[DsirScore]]/[[Md5BucketCounts]] treatment applied to the
  * distinct-cardinality sketch ([[graft.operators.Profile.vocabSketch]]):
  * tokenize → adjacent n-gram → md5-60-bit value → bounded k-min insert,
  * in a single pass per row, emitting `struct(mins: array<bigint>,
  * n: bigint)` — the doc's ascending distinct k smallest hash values and
  * its gram count. The composed form it replaces exploded every gram to
  * its own row (corpus-gram-sized row churn through concat_ws + md5 +
  * the per-row aggregate path — measured 13.3 s / 5.7× behind the
  * DuckDB twin at 100×); the kernel keeps the whole gram loop inside
  * whole-stage codegen and hands the aggregate ≤ k longs per DOCUMENT.
  *
  * Bit-identical by construction to the composed chain (spec-pinned):
  * tokens = [[WordShinglesKernel.tokenize]] (IS `split(trim(text),
  * "\\s+")`); gram bytes = token bytes joined by ' ' (exactly
  * `concat_ws(" ", slice(toks, i, n))`'s UTF-8); hash =
  * [[Md5Bucket.value60OfDigest]] — the one shared definition of the
  * house md5-60-bit value; short docs (< n tokens) emit zero grams.
  */
case class KmvMins(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if shingleN >= 1 && k >= 2 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_mins requires STRING, shingleN >= 1 and k >= 2, got " +
        s"${t.simpleString} / $shingleN / $k")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))

  def sketch(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    val md = Md5Bucket.digest.get()
    val buf = new Array[Long](k)
    var len = 0
    def insert(v: Long): Unit = {
      if (len == k && v >= buf(len - 1)) return
      val idx = java.util.Arrays.binarySearch(buf, 0, len, v)
      if (idx >= 0) return // repeats never change a distinct-set sketch
      val at = -(idx + 1)
      val move = math.min(len, k - 1) - at
      if (move > 0) System.arraycopy(buf, at, buf, at + 1, move)
      buf(at) = v
      if (len < k) len += 1
    }
    val grams = math.max(toks.length - (shingleN - 1), 0)
    var i = 0
    while (i < grams) {
      md.reset()
      var j = 0
      while (j < shingleN) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(i + j).getBytes)
        j += 1
      }
      insert(Md5Bucket.value60OfDigest(md))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          java.util.Arrays.copyOf(buf, len)),
        grams.toLong))
  }

  override def nullSafeEval(s: Any): Any = sketch(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmvMins", this, classOf[KmvMins].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.sketch($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): KmvMins =
    copy(child = newChild)
}

object KmvMins {
  def apply(text: Column, shingleN: Int, k: Int): Column =
    ColumnBridge.column(
      new KmvMins(ColumnBridge.expression(text), shingleN, k))
}
