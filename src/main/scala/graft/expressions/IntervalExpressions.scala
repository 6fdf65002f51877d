package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Sorted-interval containment probe for
  * [[graft.operators.Events.rangeJoinBroadcast]]: the bounded interval
  * set `[start, end)` rides the expression (the Bm25TermStats model-
  * embed pattern), each task sorts it once lazily by start and keeps a
  * running left-max of `end`, and every point evaluates to the array of
  * ORIGINAL interval indices containing it — binary-search to the last
  * start <= ts, then walk left while the prefix max-end still exceeds ts
  * (the classic staircase cutoff, exact for any overlap structure). One
  * codegen'd projection replaces the banded join's interval×buckets
  * explode, bucket equi-join, and containment re-filter.
  */
case class IntervalMatch(child: Expression, starts: Array[Long],
                         ends: Array[Long]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if starts.length == ends.length =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"interval_match requires BIGINT ts and equal-length bounds, got " +
        s"${t.simpleString} / ${starts.length}/${ends.length}")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  // case-class equality would compare the Array fields by REFERENCE,
  // so two semantically identical instances would never compare equal —
  // defeating Catalyst's semanticEquals-based reuse (CSE, exchange/
  // subquery reuse) and making canonicalization inconsistent. Compare
  // the bounds by content.
  override def equals(other: Any): Boolean = other match {
    case that: IntervalMatch =>
      child == that.child &&
        java.util.Arrays.equals(starts, that.starts) &&
        java.util.Arrays.equals(ends, that.ends)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(starts)),
      Integer.valueOf(java.util.Arrays.hashCode(ends)))

  // sorted-by-start view + running max of end over the sorted prefix,
  // built once per task (the expression is immutable; the caller's
  // maxIntervals guard — rangeJoinBroadcast, default 1<<16 — bounds the
  // arrays to genuinely broadcast scale, ~16 B per interval here)
  @transient private lazy val order: Array[Int] =
    starts.indices.sortBy(starts(_)).toArray
  @transient private lazy val sortedStarts: Array[Long] = order.map(starts(_))
  @transient private lazy val sortedEnds: Array[Long] = order.map(ends(_))
  @transient private lazy val prefixMaxEnd: Array[Long] = {
    val m = new Array[Long](sortedEnds.length)
    var best = Long.MinValue
    var i = 0
    while (i < sortedEnds.length) {
      if (sortedEnds(i) > best) best = sortedEnds(i)
      m(i) = best
      i += 1
    }
    m
  }

  def matches(ts: Long): GenericArrayData = {
    // rightmost sorted index with start <= ts
    var lo = 0; var hi = sortedStarts.length - 1; var j = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (sortedStarts(mid) <= ts) { j = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (j < 0) return IntervalMatch.Empty
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var i = j
    while (i >= 0 && prefixMaxEnd(i) > ts) {
      if (sortedEnds(i) > ts) out += order(i)
      i -= 1
    }
    if (out.isEmpty) IntervalMatch.Empty else new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = matches(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intervalMatch", this,
      classOf[IntervalMatch].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.matches($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): IntervalMatch =
    copy(child = newChild)
}

object IntervalMatch {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def apply(ts: Column, starts: Array[Long], ends: Array[Long]): Column =
    ColumnBridge.column(
      new IntervalMatch(ColumnBridge.expression(ts), starts, ends))
}
