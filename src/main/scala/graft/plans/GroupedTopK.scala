package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Grouped top-k as a first-class operator: keep the `k` rows with the
  * smallest `order` value per group (lexicographic for struct orders; wrap
  * descending columns by negation or struct tricks).
  *
  * Why a custom operator: the DataFrame phrasing —
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — must SORT
  * every group in full (O(n log n) per group, full materialization in the
  * window buffer) just to discard all but k rows. This physical operator
  * keeps a bounded max-heap per group (O(n log k), O(groups·k) memory) after
  * the same single clustered shuffle. The classic D3 shape (per-slide tile
  * sampling, dataset_classes_v1.py:44-51) at 100 TB: billions of tiles,
  * k≈100 — the sort buffer is the difference between fitting in memory and
  * spilling.
  *
  * Mechanism demo for the whole custom-operator ladder: LogicalPlan node →
  * SparkStrategy (via SparkSessionExtensions.injectPlannerStrategy or
  * spark.experimental.extraStrategies) → UnaryExecNode with
  * requiredChildDistribution driving the exchange.
  *
  * Tie behavior at the k boundary is unspecified (like the reference's
  * unordered sampling) — pass a totally-ordering `order` expression (e.g.
  * `struct(score, id)`) when exact reproducibility is required.
  */
case class GroupedTopKPlan(k: Int, groupExprs: Seq[Expression],
                           order: Expression, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKPlan =
    copy(child = newChild)
}

/** Two-phase execution, aggregate-style: a `partial = true` instance runs
  * the SAME bounded-heap filter on each MAP-SIDE partition (no distribution
  * requirement, so it sits below the exchange), cutting shuffle volume from
  * |rows| to ≤ |partition-local groups|·k per partition; the final instance
  * (ClusteredDistribution) merges the survivors. The filter is idempotent —
  * running it before AND after the shuffle is exactly the map-side-combine
  * argument for sum/count, applied to top-k. At the 100× probe (15 M rows,
  * 15 k groups, k=3) the partial pass removes ~90% of shuffle rows.
  */
case class GroupedTopKExec(k: Int, groupExprs: Seq[Expression],
                           order: Expression, child: SparkPlan,
                           partial: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def nodeName: String =
    if (partial) "GroupedTopKPartial" else "GroupedTopK"
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    child.execute().mapPartitions { iter =>
      import org.apache.spark.sql.catalyst.expressions.{Ascending, BindReferences, CreateNamedStruct, SortOrder}
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      // the order is compared DIRECTLY between rows by a codegen'd
      // lexicographic ordering over the order expression's fields — a
      // struct() order decomposes into per-field SortOrders (identical
      // lexicographic + nulls-first semantics), so the hot loop does NO
      // order-value projection, no struct allocation, and no per-accept
      // order copy: per input row it is key-project, map lookup, and one
      // field-wise compare against the heap head. (The prior shape
      // projected the order value into a one-column UnsafeRow per row —
      // itself a rework of the boxed interpreted compare that dominated
      // the 100x partial pass.)
      val fieldOrders = orderLocal match {
        case s: CreateNamedStruct => s.valExprs.map(e => SortOrder(e, Ascending))
        case o => Seq(SortOrder(o, Ascending))
      }
      val cmp = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.generate(fieldOrders.map(so =>
          so.copy(child = BindReferences.bindReference(so.child, childOutput))))
      // max-heap of size k per group: head = current worst of the kept k.
      // Entries are the projected row copies; the ordering expressions
      // evaluate identically on them because rowProj preserves the child
      // schema.
      val heapOrd = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          cmp.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(rowProj(row).copy())
        } else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(rowProj(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKPlan(k, g, o, child) =>
      GroupedTopKExec(k, g, o,
        GroupedTopKExec(k, g, o, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {
  /** Keep the k rows with the smallest `order` value per group. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], order: Column,
               k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    // Columns resolve only through the analyzer: analyze a throwaway
    // projection of (groups :+ order) and lift out its resolved expressions
    // (bound to the same attribute ids as its child plan).
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val tagged = df.select(
      (groupCols :+ order).zipWithIndex.map { case (c, i) => c.as(s"__gtk$i") }: _*)
    val project = tagged.queryExecution.analyzed.asInstanceOf[Project]
    val exprs = project.projectList.map {
      case a: Alias => a.child
      case e => e
    }
    ColumnBridge.ofRows(spark,
      GroupedTopKPlan(k, exprs.take(groupCols.size), exprs.last, project.child))
  }
}
