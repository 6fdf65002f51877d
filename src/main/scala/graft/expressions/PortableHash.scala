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
    val d = md.digest(s.asInstanceOf[UTF8String].getBytes)
    // first 8 digest bytes big-endian, dropped to the top 60 bits —
    // exactly the integer the 15-hex-char prefix parses to
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.remainderUnsigned(v >>> 4, buckets.toLong)
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
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(s: Column, buckets: Int): Column =
    ColumnBridge.column(new Md5Bucket(ColumnBridge.expression(s), buckets))
}
