package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Plan-shape helpers for expensive kernel columns. */
object KernelOps {

  /** Keep only rows where `kernel` is non-null, evaluating the kernel
    * ONCE per row: `explode(filter(array(kernel), notNull))` — the
    * 1-element array drops to empty when the kernel nulls out, and the
    * Generate both eliminates those rows and BLOCKS predicate pushdown.
    *
    * The shape it replaces — project the kernel, then
    * `.filter(col.isNotNull)` — is a plan hazard: the optimizer pushes
    * the filter below the projection and INLINES the kernel into the
    * predicate, so the kernel runs once in the filter plus once in the
    * projection (and once per reference for multi-reference predicates
    * — the BM25 serve's matched>0 pushdown measured 3.5× the bare
    * kernel scan at 100× on exactly this shape). Spark's whole-stage
    * codegen does not eliminate common subexpressions ACROSS operators,
    * only within a projection, so the duplication is real executed work.
    */
  def explodeNonNull(kernel: Column): Column =
    explodeKept(kernel, _.isNotNull)

  /** [[explodeNonNull]] with a caller-supplied keep predicate — for
    * multi-kernel projections: pack the kernel columns into a struct,
    * keep on the deciding field, and unpack above the Generate (each
    * kernel still evaluated exactly once).
    */
  def explodeKept(value: Column, keep: Column => Column): Column =
    explode(filter(array(value), keep))
}
