package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflate(text).length / text.length`.
  *
  * A standard pretraining-data heuristic (used by RedPajama-v2's
  * `ccnet_compression_ratio` class of signals): highly repetitive or
  * templated documents compress far below ~0.4, natural prose lands around
  * 0.4–0.8, and random/encrypted/base64 junk approaches or exceeds 1.0 —
  * one scalar that catches both boilerplate spam and binary noise.
  *
  * Native codegen'd expression (not a UDF): the Deflater call runs inside
  * whole-stage codegen per row at scan speed, no serialization boundary.
  * The per-call Deflater is allocated and `end()`ed inside the kernel —
  * JDK zlib allocation is cheap relative to compressing a document, and
  * keeping the expression stateless makes it trivially thread-safe across
  * codegen'd tasks.
  *
  * Determinism: raw-deflate at level 6 over UTF-8 bytes is a pure function
  * of the input within a JVM vendor+version; results are stable across
  * runs, partitions, and retries (the property the dedup/curation plane
  * requires). Cross-ENGINE replay is impossible (DuckDB exposes no
  * deflate), so queries over this signal use contract oracles (bounds +
  * monotonicity) rather than value equality.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  protected override def nullSafeEval(input: Any): Any =
    DeflateRatioKernel.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = DeflateRatioKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$kernel.ratio($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatioKernel {
  /** deflate-compressed size over raw UTF-8 size; empty string → 1.0. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
    d.setInput(bytes)
    d.finish()
    // worst case for raw deflate is stored blocks: ~5 bytes per 64 KiB + 1;
    // the buffer is recycled per deflate() call, only the count accumulates
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / bytes.length
  }
}

object TextSignalExpressions {
  /** Column form of [[DeflateRatio]]. */
  def deflateRatio(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))
}
