package graft

import graft.expressions.{GramCounts, MinHashSignature, ShingleJaccard, SimHash64, SrpSignature, VecDot, WordShingles}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL surface for graft's native expressions.
  *
  * Two entry points:
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` registers the
  *    functions at session build (the standard deployment path for a Spark
  *    library shipping custom Catalyst expressions);
  *  - `GraftExtensions.register(spark)` injects them into an already-running
  *    session (tests, notebooks).
  *
  * After either, plain SQL can use the kernels:
  * {{{
  *   SELECT vec_dot(a.embedding, b.embedding)          -- codegen'd dot product
  *   SELECT minhash_signature(word_shingles(text, 3), 32)
  *   SELECT simhash64(split(text, '\\s+'))
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[GraftExtensions].getName, name),
          builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  private def longArg(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT or BIGINT argument, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args => VecDot(args(0), args(1)) },
    "word_shingles" -> { args => WordShingles(args(0), intArg(args(1), "word_shingles")) },
    "minhash_signature" -> { args =>
      MinHashSignature(args(0), intArg(args(1), "minhash_signature")) },
    "simhash64" -> { args => SimHash64(args(0)) },
    "shingle_jaccard" -> { args =>
      ShingleJaccard(args(0), args(1), intArg(args(2), "shingle_jaccard")) },
    "srp_signature" -> { args =>
      SrpSignature(args(0), intArg(args(1), "srp_signature"),
        longArg(args(2), "srp_signature")) },
    "gram_counts" -> { args =>
      GramCounts(args(0), intArg(args(1), "gram_counts")) })

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
