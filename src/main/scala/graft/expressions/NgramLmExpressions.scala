package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document n-gram-LM scoring as ONE fused scalar kernel:
  * struct(n_bigrams, oov_bigrams, lm_score) in a single pass over the text
  * against a bounded in-expression model (the RepetitionStats pattern).
  * `order` generalizes the readout beyond bigrams: the context map holds
  * (order-1)-gram counts and the gram map order-gram counts — the struct
  * field names keep their bigram-era spelling for oracle compatibility
  * (they mean "scored grams" at any order).
  *
  * Replaces the composed plan — bigram generate → explode → two broadcast
  * joins → per-document hash aggregation — whose 100× cost was ~4 s of
  * per-occurrence join probing and aggregation; this is a pure projection
  * inside whole-stage codegen with ZERO shuffle. The model arrays ride the
  * serialized expression (bounded by the fit caps — the same reason the
  * caps exist for 100 TB); each task builds its hash maps once, lazily.
  *
  * Arithmetic is IDENTICAL to the composed form and the q5k SQL oracle:
  * per-gram `round(1e6 · ln((c2+1)/(c1+V)))` summed as exact longs, with
  * [[BigramLmScore.halfUp]] reproducing `functions.round`'s HALF_UP
  * semantics exactly (including the half-away-from-zero behavior on
  * negative .5 values, where `Math.round`'s floor(x+0.5) would differ).
  */
case class BigramLmScore(child: Expression,
                         uni: Array[(String, Long)],
                         bi: Array[(String, Long)],
                         vocabV: Long,
                         order: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if vocabV > 0 && order >= 2 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_lm_score requires STRING, V > 0, order >= 2, " +
        s"got ${t.simpleString} / $vocabV / $order")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("oov_bigrams", LongType, nullable = false),
    StructField("lm_score", LongType, nullable = false)))

  @transient private lazy val uniMap: java.util.HashMap[UTF8String, Long] = {
    val m = new java.util.HashMap[UTF8String, Long](uni.length * 2)
    uni.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val biMap: java.util.HashMap[UTF8String, Long] = {
    val m = new java.util.HashMap[UTF8String, Long](bi.length * 2)
    bi.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  def score(text: UTF8String): InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    val w = order - 1 // context width
    val nGr = math.max(toks.length - w, 0)
    var oov = 0L
    var total = 0L
    var i = 0
    while (i < nGr) {
      // context = the (order-1)-gram at i, target = the order-gram at i;
      // for order 2 this is exactly the original (w1, "w1 w2") pair
      val ctx =
        if (w == 1) toks(i)
        else {
          val cp = new Array[UTF8String](w)
          System.arraycopy(toks, i, cp, 0, w)
          WordShinglesKernel.joinWith(WordShinglesKernel.SpaceSep, cp)
        }
      val gp = new Array[UTF8String](order)
      System.arraycopy(toks, i, gp, 0, order)
      val g = WordShinglesKernel.joinWith(WordShinglesKernel.SpaceSep, gp)
      val c1 = uniMap.getOrDefault(ctx, 0L)
      val c2 = biMap.getOrDefault(g, 0L)
      if (c2 == 0L) oov += 1L
      total += BigramLmScore.halfUp(1e6 *
        Math.log((c2 + 1.0) / (c1 + vocabV.toDouble)))
      i += 1
    }
    new GenericInternalRow(Array[Any](nGr.toLong, oov, total))
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmKernel", this, classOf[BigramLmScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramLmScore =
    copy(child = newChild)
}

object BigramLmScore {
  def apply(text: Column, uni: Array[(String, Long)], bi: Array[(String, Long)],
            vocabV: Long, order: Int = 2): Column =
    ColumnBridge.column(
      new BigramLmScore(ColumnBridge.expression(text), uni, bi, vocabV, order))

  /** `functions.round(x)` for doubles without the per-call BigDecimal:
    * half-away-from-zero on the binary value. Works on |x| so the
    * fractional part `a - floor(a)` is EXACT (for a < 1 it is a itself;
    * for 1 ≤ a < 2^53 both a and floor(a) are multiples of ulp(a) ≥ 2^-52
    * and the sub-1 difference fits the mantissa — note the signed form
    * `x - floor(x)` is NOT exact for x just below -0.5, where the
    * subtraction itself rounds to 0.5). Equivalent to Spark's
    * `BigDecimal.valueOf(x).setScale(0, HALF_UP)`: the only case where
    * rounding the shortest-decimal form could differ from rounding the
    * binary value — a fraction of exactly one half — occurs precisely
    * when the double IS exactly k.5, where both round away from zero.
    * Keeps the kernel and the joined/oracle paths on one rounding rule by
    * construction instead of by a transcendental-never-hits-.5 argument.
    */
  def halfUp(x: Double): Long = {
    val a = Math.abs(x)
    val f = Math.floor(a)
    val m = if (a - f >= 0.5) f.toLong + 1L else f.toLong
    if (x < 0) -m else m
  }
}

/** The perplexity-gate predicate as ONE fused boolean kernel: compute the
  * document's LM readout once and compare `ppl <= maxPpl` in place.
  *
  * Exists for the same reason as `ShingleJaccard`: a filter condition
  * that references a struct expression per field re-evaluates the struct
  * per reference (FilterExec does no common-subexpression elimination
  * across conjuncts — measured 3 kernel instances in the optimized plan),
  * while a single boolean expression is evaluated exactly once per row.
  * The perplexity is rounded to 6 dp with the same HALF_UP semantics as
  * `functions.round`, so the kept set equals
  * `scoreDocs(...).filter(ppl <= maxPpl)` bit-for-bit.
  */
case class BigramLmGate(child: Expression,
                        uni: Array[(String, Long)],
                        bi: Array[(String, Long)],
                        vocabV: Long,
                        maxPpl: Double,
                        order: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if vocabV > 0 && order >= 2 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_lm_gate requires STRING, V > 0, order >= 2, " +
        s"got ${t.simpleString} / $vocabV / $order")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val scorer =
    BigramLmScore(child, uni, bi, vocabV, order)

  def keep(text: UTF8String): Boolean = {
    val row = scorer.score(text)
    val nBi = row.getLong(0)
    if (nBi == 0L) return false
    // identical chain to `round(exp(-lm_score / (1e6 * n)), 6)`:
    // IEEE negate-then-divide == divide-then-negate, Math.exp is the
    // engine's EXP, and functions.round(_, 6) is BigDecimal HALF_UP
    val x = -row.getLong(2).toDouble / (1e6 * nBi.toDouble)
    java.math.BigDecimal.valueOf(Math.exp(x))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue() <= maxPpl
  }

  override def nullSafeEval(v: Any): Any = keep(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmGate", this, classOf[BigramLmGate].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.keep($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramLmGate =
    copy(child = newChild)
}

object BigramLmGate {
  def apply(text: Column, uni: Array[(String, Long)], bi: Array[(String, Long)],
            vocabV: Long, maxPpl: Double, order: Int = 2): Column =
    ColumnBridge.column(
      new BigramLmGate(ColumnBridge.expression(text), uni, bi, vocabV,
        maxPpl, order))
}

/** Whole-document STUPID-BACKOFF scoring (Brants et al. 2007) as one fused
  * scalar kernel: struct(n_grams, backoffs, lm_score) in a single pass
  * over the text against the full per-order count tables riding the
  * expression (`tables(i)` = capped order-(i+1) counts).
  *
  * Per order-n window, the score S takes the LONGEST level j whose gram
  * AND within-window context are both in-model:
  *   S = α^(n−j) · c_j(gram_j) / c_{j−1}(ctx_j)    (j ≥ 2)
  *   S = α^(n−1) · c_1(w_last) / T                 (j = 1)
  *   S = α^(n−1) · 1 / T                           (w_last OOV)
  * with T = Σ capped unigram counts, summed as micro-nat longs with the
  * same [[BigramLmScore.halfUp]] rounding as every other LM path. The α
  * powers are precomputed by repeated multiplication
  * ([[BackoffLmScore.alphaPowers]]) and embedded as exact double literals
  * in the joined path and the q5t SQL oracle, so the per-term double
  * chain — (α-power · c) then / d, ln, round — is bit-identical on every
  * path and engine.
  */
case class BackoffLmScore(child: Expression,
                          tables: Array[Array[(String, Long)]],
                          alpha: Double) extends UnaryExpression {

  private def order: Int = tables.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if order >= 2 && alpha > 0 && alpha < 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"backoff_lm_score requires STRING, order >= 2, alpha in (0,1), " +
        s"got ${t.simpleString} / $order / $alpha")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("backoffs", LongType, nullable = false),
    StructField("lm_score", LongType, nullable = false)))

  @transient private lazy val maps: Array[java.util.HashMap[UTF8String, Long]] =
    tables.map { t =>
      val m = new java.util.HashMap[UTF8String, Long](t.length * 2)
      t.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
      m
    }
  @transient private lazy val alphaPow: Array[Double] =
    BackoffLmScore.alphaPowers(alpha, order)
  @transient private lazy val uniTotal: Double = {
    var s = 0L
    tables(0).foreach(s += _._2)
    s.toDouble
  }

  def score(text: UTF8String): InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    val n = order
    val nW = math.max(toks.length - n + 1, 0)
    var backoffs = 0L
    var total = 0L
    var i = 0
    while (i < nW) {
      var s = 0.0
      var level = 0 // chosen level j; 0 = not yet found
      var j = n
      while (level == 0 && j >= 2) {
        val start = i + n - j
        val gp = new Array[UTF8String](j)
        System.arraycopy(toks, start, gp, 0, j)
        val cg = maps(j - 1).getOrDefault(
          WordShinglesKernel.joinWith(WordShinglesKernel.SpaceSep, gp), 0L)
        if (cg != 0L) {
          val cp = new Array[UTF8String](j - 1)
          System.arraycopy(toks, start, cp, 0, j - 1)
          val cd = maps(j - 2).getOrDefault(
            WordShinglesKernel.joinWith(WordShinglesKernel.SpaceSep, cp), 0L)
          if (cd != 0L) {
            s = alphaPow(n - j) * cg / cd
            level = j
          }
        }
        if (level == 0) j -= 1
      }
      if (level == 0) {
        val c1 = maps(0).getOrDefault(toks(i + n - 1), 0L)
        s = if (c1 != 0L) alphaPow(n - 1) * c1 / uniTotal
            else alphaPow(n - 1) / uniTotal
        level = 1
      }
      if (level < n) backoffs += 1L
      total += BigramLmScore.halfUp(1e6 * Math.log(s))
      i += 1
    }
    new GenericInternalRow(Array[Any](nW.toLong, backoffs, total))
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("backoffKernel", this,
      classOf[BackoffLmScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BackoffLmScore =
    copy(child = newChild)
}

/** The stupid-backoff perplexity-gate predicate as ONE fused boolean
  * kernel — [[BigramLmGate]]'s pattern applied to the backoff scorer: the
  * whole readout evaluates once per row inside the filter (a per-field
  * struct reference would re-run the kernel per conjunct), and the
  * threshold compares the same 6-dp HALF_UP `ppl` that
  * [[graft.ml.NgramLm.scoreDocsBackoff]] emits, so the kept set equals
  * `scoreDocsBackoff(...).filter(ppl <= maxPpl)` bit-for-bit.
  */
case class BackoffLmGate(child: Expression,
                         tables: Array[Array[(String, Long)]],
                         alpha: Double,
                         maxPpl: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if tables.length >= 2 && alpha > 0 && alpha < 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"backoff_lm_gate requires STRING, order >= 2, alpha in (0,1), " +
        s"got ${t.simpleString} / ${tables.length} / $alpha")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val scorer =
    BackoffLmScore(child, tables, alpha)

  def keep(text: UTF8String): Boolean = {
    val row = scorer.score(text)
    val n = row.getLong(0)
    if (n == 0L) return false
    val x = -row.getLong(2).toDouble / (1e6 * n.toDouble)
    java.math.BigDecimal.valueOf(Math.exp(x))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue() <= maxPpl
  }

  override def nullSafeEval(v: Any): Any = keep(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("backoffGate", this,
      classOf[BackoffLmGate].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.keep($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BackoffLmGate =
    copy(child = newChild)
}

object BackoffLmGate {
  def apply(text: Column, tables: Array[Array[(String, Long)]],
            alpha: Double, maxPpl: Double): Column =
    ColumnBridge.column(
      new BackoffLmGate(ColumnBridge.expression(text), tables, alpha, maxPpl))
}

/** Whole-document INTERPOLATED KNESER-NEY scoring (Kneser & Ney 1995,
  * the KenLM smoothing) as one fused scalar kernel over the SAME capped
  * unigram/bigram count tables the add-V model fits — one fit, two
  * smoothers. All KN statistics derive deterministically FROM the capped
  * bigram table (the model artifact), so the oracle can replay them with
  * plain SQL aggregation:
  *   - nf(v)  = #distinct w with "v w" in the capped table (N1+(v·))
  *   - nb(w)  = #distinct v with "v w" in the capped table (N1+(·w))
  *   - M      = capped-table row count (N1+(··))
  * Per bigram (v, w) with true counts c1 = c(v), c2 = c(v w), discount D
  * and Pc(w) = (nb(w)+1)/(M+V) — add-one-smoothed continuation, so every
  * probability is strictly positive even for words the capped table
  * never continues:
  *   P = (c2−D)/c1 + (D·(nf(v)+1)/c1)·Pc(w)   (v in model, bigram in model)
  *   P =            (D·(nf(v)+1)/c1)·Pc(w)    (v in model, bigram absent)
  *   P = Pc(w)                                 (v out of model)
  * summed as micro-nat longs with the same [[BigramLmScore.halfUp]]
  * rounding as every other LM path. Each double chain is the exact
  * left-to-right op sequence the joined path and the q5v SQL oracle
  * spell, so the integer sum replays bit-for-bit cross-engine.
  */
case class KnLmScore(child: Expression,
                     uni: Array[(String, Long)],
                     bi: Array[(String, Long)],
                     vocabV: Long,
                     discount: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if vocabV > 0 && discount > 0 && discount < 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kn_lm_score requires STRING, V > 0, discount in (0,1), " +
        s"got ${t.simpleString} / $vocabV / $discount")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("oov_bigrams", LongType, nullable = false),
    StructField("lm_score", LongType, nullable = false)))

  @transient private lazy val uniMap: java.util.HashMap[UTF8String, Long] = {
    val m = new java.util.HashMap[UTF8String, Long](uni.length * 2)
    uni.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val biMap: java.util.HashMap[UTF8String, Long] = {
    val m = new java.util.HashMap[UTF8String, Long](bi.length * 2)
    bi.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  /** N1+(v·) and N1+(·w) from the capped bigram table — built once per
    * task from the rows already riding the expression.
    */
  @transient private lazy val (nfMap, nbMap) = {
    val nf = new java.util.HashMap[UTF8String, Long](bi.length * 2)
    val nb = new java.util.HashMap[UTF8String, Long](bi.length * 2)
    bi.foreach { case (g, _) =>
      val sp = g.indexOf(' ')
      val v = UTF8String.fromString(g.substring(0, sp))
      val w = UTF8String.fromString(g.substring(sp + 1))
      nf.merge(v, 1L, (a, b) => a + b)
      nb.merge(w, 1L, (a, b) => a + b)
    }
    (nf, nb)
  }
  @transient private lazy val contDenom: Double = (bi.length + vocabV).toDouble

  def score(text: UTF8String): InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    val nGr = math.max(toks.length - 1, 0)
    var oov = 0L
    var total = 0L
    var i = 0
    while (i < nGr) {
      val v = toks(i)
      val w = toks(i + 1)
      val gp = new Array[UTF8String](2)
      gp(0) = v; gp(1) = w
      val g = WordShinglesKernel.joinWith(WordShinglesKernel.SpaceSep, gp)
      val c1 = uniMap.getOrDefault(v, 0L)
      val c2 = biMap.getOrDefault(g, 0L)
      if (c2 == 0L) oov += 1L
      // EXACT op order shared with the joined path and the SQL oracle:
      // pc = (nb+1)/(M+V); P = t1 + ((D*(nf+1))/c1)*pc, t1 = (c2-D)/c1
      val pc = (nbMap.getOrDefault(w, 0L) + 1.0) / contDenom
      val p =
        if (c1 == 0L) pc
        else {
          val t1 = if (c2 == 0L) 0.0 else (c2 - discount) / c1.toDouble
          t1 + discount * (nfMap.getOrDefault(v, 0L) + 1.0) / c1.toDouble * pc
        }
      total += BigramLmScore.halfUp(1e6 * Math.log(p))
      i += 1
    }
    new GenericInternalRow(Array[Any](nGr.toLong, oov, total))
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("knKernel", this, classOf[KnLmScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): KnLmScore =
    copy(child = newChild)
}

object KnLmScore {
  def apply(text: Column, uni: Array[(String, Long)], bi: Array[(String, Long)],
            vocabV: Long, discount: Double): Column =
    ColumnBridge.column(
      new KnLmScore(ColumnBridge.expression(text), uni, bi, vocabV, discount))
}

/** Order-3 INTERPOLATED Kneser-Ney — the full KenLM recursion, two
  * levels deep, over the stupid-backoff model's per-order capped count
  * tables (`tables(0..2)` = unigram/bigram/trigram counts from the ONE
  * multi-order fit scan): per trigram window (w1 w2 w3),
  *   P3 = (c3−D)/c2ctx + (D·(N1+(w1w2·)+1)/c2ctx) · P2   (bigram ctx in model)
  *   P3 = P2                                              (ctx out of model)
  * where the lower distribution P2 is EXACTLY [[KnLmScore]]'s bigram-KN
  * readout of (w2, w3) over the same bigram/unigram tables (discounted
  * bigram mass + add-one-smoothed continuation), so every branch is
  * strictly positive and the whole recursion derives from the capped
  * tables alone. The discounted trigram mass uses (c3−D) without a max
  * clamp — counts are ≥ 1 and D < 1, so it is positive whenever the
  * trigram is present. Micro-nat longs via [[BigramLmScore.halfUp]]; P2
  * is computed ONCE per window and reused in both branches, mirroring
  * the staged CTE of the q5w oracle, so the double chains replay
  * bit-for-bit cross-engine.
  */
case class Kn3LmScore(child: Expression,
                      tables: Array[Array[(String, Long)]],
                      vocabV: Long,
                      discount: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if tables.length == 3 && vocabV > 0 &&
        discount > 0 && discount < 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kn3_lm_score requires STRING, 3 tables, V > 0, discount in (0,1), " +
        s"got ${t.simpleString} / ${tables.length} / $vocabV / $discount")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_trigrams", LongType, nullable = false),
    StructField("oov_trigrams", LongType, nullable = false),
    StructField("lm_score", LongType, nullable = false)))

  @transient private lazy val Array(uniMap, biMap, triMap) =
    tables.map { t =>
      val m = new java.util.HashMap[UTF8String, Long](t.length * 2)
      t.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
      m
    }
  /** N1+(w2·) and N1+(·w3) from the capped bigram table (q5v's stats). */
  @transient private lazy val (nf2Map, nb2Map) = {
    val nf = new java.util.HashMap[UTF8String, Long](tables(1).length * 2)
    val nb = new java.util.HashMap[UTF8String, Long](tables(1).length * 2)
    tables(1).foreach { case (g, _) =>
      val sp = g.indexOf(' ')
      nf.merge(UTF8String.fromString(g.substring(0, sp)), 1L, (a, b) => a + b)
      nb.merge(UTF8String.fromString(g.substring(sp + 1)), 1L, (a, b) => a + b)
    }
    (nf, nb)
  }
  /** N1+(w1w2·) from the capped trigram table. */
  @transient private lazy val nf3Map = {
    val m = new java.util.HashMap[UTF8String, Long](tables(2).length * 2)
    tables(2).foreach { case (g, _) =>
      m.merge(UTF8String.fromString(g.substring(0, g.lastIndexOf(' '))),
        1L, (a, b) => a + b)
    }
    m
  }
  @transient private lazy val contDenom: Double =
    (tables(1).length + vocabV).toDouble

  def score(text: UTF8String): InternalRow = {
    val toks = WordShinglesKernel.tokenize(text)
    val nW = math.max(toks.length - 2, 0)
    var oov = 0L
    var total = 0L
    var i = 0
    while (i < nW) {
      val w1 = toks(i); val w2 = toks(i + 1); val w3 = toks(i + 2)
      def join2(a: UTF8String, b: UTF8String): UTF8String = {
        val p = new Array[UTF8String](2); p(0) = a; p(1) = b
        WordShinglesKernel.joinWith(WordShinglesKernel.SpaceSep, p)
      }
      val g12 = join2(w1, w2)
      val g23 = join2(w2, w3)
      val gp = new Array[UTF8String](3); gp(0) = w1; gp(1) = w2; gp(2) = w3
      val g123 = WordShinglesKernel.joinWith(WordShinglesKernel.SpaceSep, gp)
      // P2: the q5v bigram-KN readout of (w2, w3) — exact op order
      val c1 = uniMap.getOrDefault(w2, 0L)
      val c23 = biMap.getOrDefault(g23, 0L)
      val pc = (nb2Map.getOrDefault(w3, 0L) + 1.0) / contDenom
      val p2 =
        if (c1 == 0L) pc
        else {
          val t1 = if (c23 == 0L) 0.0 else (c23 - discount) / c1.toDouble
          t1 + discount * (nf2Map.getOrDefault(w2, 0L) + 1.0) / c1.toDouble * pc
        }
      // P3: discounted trigram mass + continuation-weighted P2
      val c12 = biMap.getOrDefault(g12, 0L)
      val c123 = triMap.getOrDefault(g123, 0L)
      if (c123 == 0L) oov += 1L
      val p =
        if (c12 == 0L) p2
        else {
          val s1 = if (c123 == 0L) 0.0 else (c123 - discount) / c12.toDouble
          s1 + discount * (nf3Map.getOrDefault(g12, 0L) + 1.0) / c12.toDouble * p2
        }
      total += BigramLmScore.halfUp(1e6 * Math.log(p))
      i += 1
    }
    new GenericInternalRow(Array[Any](nW.toLong, oov, total))
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kn3Kernel", this, classOf[Kn3LmScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Kn3LmScore =
    copy(child = newChild)
}

object Kn3LmScore {
  def apply(text: Column, tables: Array[Array[(String, Long)]],
            vocabV: Long, discount: Double): Column =
    ColumnBridge.column(
      new Kn3LmScore(ColumnBridge.expression(text), tables, vocabV, discount))
}

object BackoffLmScore {
  def apply(text: Column, tables: Array[Array[(String, Long)]],
            alpha: Double): Column =
    ColumnBridge.column(
      new BackoffLmScore(ColumnBridge.expression(text), tables, alpha))

  /** α^0..α^(order−1) by repeated multiplication — the ONE definition of
    * the per-level discount every scoring path and the SQL oracle embed
    * (Math.pow could differ in the last ulp from the multiplication
    * chain; one definition removes the question).
    */
  def alphaPowers(alpha: Double, order: Int): Array[Double] = {
    val a = new Array[Double](order)
    a(0) = 1.0
    var i = 1
    while (i < order) { a(i) = a(i - 1) * alpha; i += 1 }
    a
  }
}
