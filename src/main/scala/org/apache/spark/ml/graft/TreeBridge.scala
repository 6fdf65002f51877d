package org.apache.spark.ml.graft

import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}

/** private[ml] escape hatch (the ColumnBridge pattern): decision-tree
  * internals — leaf class-count statistics and split structure — are
  * `private[ml]`, but exporting a fitted forest as replayable SQL needs
  * exactly those. This bridge copies them into a plain public ADT; all
  * SQL generation lives in graft.ml.MetaClassifier.
  */
object TreeBridge {

  sealed trait ExportedNode
  /** Leaf with its per-class training counts (`impurityStats.stats`) —
    * the numbers MLlib's `predictRaw` turns into per-tree probability
    * votes (`classCounts(i) / total`).
    */
  final case class ExportedLeaf(counts: Array[Double]) extends ExportedNode
  /** Continuous split: goes LEFT iff `feature(featureIndex) <= threshold`
    * (`ContinuousSplit.shouldGoLeft` semantics).
    */
  final case class ExportedBranch(featureIndex: Int, threshold: Double,
                                  left: ExportedNode,
                                  right: ExportedNode) extends ExportedNode

  def export(node: Node): ExportedNode = node match {
    case l: LeafNode => ExportedLeaf(l.impurityStats.stats.clone())
    case i: InternalNode => i.split match {
      case c: ContinuousSplit =>
        ExportedBranch(c.featureIndex, c.threshold,
          export(i.leftChild), export(i.rightChild))
      case c: CategoricalSplit => throw new UnsupportedOperationException(
        s"SQL export supports continuous splits only; feature " +
          s"${c.featureIndex} split categorically — declare it continuous " +
          "or one-hot it upstream")
    }
  }
}
