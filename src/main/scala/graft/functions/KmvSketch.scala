package graft.functions


import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a mergeable Spark
  * `Aggregator` (Bar-Yossef et al. 2002 / Beyer et al. 2007): corpus
  * distinct-cardinality estimation — vocabulary size, distinct n-grams,
  * distinct URLs — in O(k) memory per partition, replacing the exact
  * `distinct().count()` whose shuffle carries EVERY distinct value
  * across the wire (vocabulary-sized at 100 TB).
  *
  * The sketch keeps the k smallest DISTINCT hash values seen; with a
  * uniform hash over [0, 2^60) the k-th smallest value h_k estimates
  * the cardinality as (k−1)·2^60/h_k (the unbiased KMV estimator).
  * Mergeable by construction: the union's k smallest values are the k
  * smallest of the concatenated summaries, so Spark's partial
  * aggregation is exact — only ≤k longs per partition cross the
  * shuffle, and the merged sketch equals the single-pass one
  * bit-for-bit (spec-pinned; layout-invariant).
  *
  * DETERMINISM / the full-oracle contract (where HLL-class sketches
  * fail): the hash is the house md5-60-bit value — the q47/q57/q6j
  * engine-portable chain — so the whole sketch (the k values, h_k,
  * and the estimate) is a deterministic function of the input SET,
  * replayable in any engine with md5: the q7c oracle recomputes the k
  * smallest distinct hashes and the integer estimate in SQL and the
  * hash compare pins them. `approx_count_distinct` (HLL++) gives a
  * rows-only check at best; this gives the house bit-equality.
  */
class KmvSketch(k: Int) extends Aggregator[Long,
    Array[Long], Array[Long]] with Serializable {
  require(k >= 2, s"k must be >= 2, got $k")

  // buffer = the ascending distinct k-mins as a plain Array[Long]: the
  // native array encoder round-trips it (a TreeSet buffer dies in kryo
  // decoding — its ordering does not reconstruct), and the copy-on-
  // insert cost amortizes out: once saturated, rows >= the current k-th
  // (the overwhelming majority) return the buffer untouched
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    if (b.length == k && a >= b(k - 1)) return b
    val idx = java.util.Arrays.binarySearch(b, a)
    if (idx >= 0) return b // repeats never change a distinct-set sketch
    val at = -(idx + 1)
    val out = new Array[Long](math.min(b.length + 1, k))
    System.arraycopy(b, 0, out, 0, at)
    out(at) = a
    System.arraycopy(b, at, out, at + 1,
      math.min(b.length - at, k - at - 1))
    out
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    // summaries are tiny (<= k each); the union's k smallest distinct
    // values are exactly the k smallest of the concatenation
    (b1 ++ b2).distinct.sorted.take(k)

  /** Ascending k smallest distinct hash values (fewer iff the input had
    * fewer distinct values — then the sketch IS the exact distinct set).
    */
  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Union of per-document KMV partial sketches ([[graft.expressions
  * .KmvMins]] output): each input is already an ascending distinct
  * ≤k-array, so reduce and merge are the same O(k) sorted-merge-dedup —
  * the aggregate sees one small array per DOCUMENT instead of one row
  * per gram (the fused-kernel scale shape; [[KmvSketch]] remains the
  * value-at-a-time form the composed chain and the spec pin use).
  */
class KmvUnion(k: Int) extends Aggregator[Array[Long],
    Array[Long], Array[Long]] with Serializable {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
    KmvUnion.mergeSorted(b, a, k)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    KmvUnion.mergeSorted(b1, b2, k)

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvUnion {
  /** The k smallest distinct values of two ascending distinct arrays —
    * one O(min(|a|+|b|, k)) merge pass, no allocation churn.
    */
  private[functions] def mergeSorted(a: Array[Long], b: Array[Long],
                                     k: Int): Array[Long] = {
    if (b == null || b.isEmpty) return a
    if (a.isEmpty)
      return if (b.length <= k) b else java.util.Arrays.copyOf(b, k)
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val x = a(i); if (j < b.length && b(j) == x) j += 1; i += 1; x
        } else { val x = b(j); j += 1; x }
      out(o) = v
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  def kmvUnion(mins: Column, k: Int): Column =
    udaf(new KmvUnion(k)).apply(mins)
}

object KmvSketch {
  /** Column form: aggregate a 60-bit-hash column into its ascending
    * k-minimum-values summary (`ARRAY<BIGINT>`).
    */
  def kmv(hash60: Column, k: Int): Column =
    udaf(new KmvSketch(k)).apply(hash60)

  /** The exact-integer KMV estimate from a finished sketch: the input's
    * distinct count when the sketch is unsaturated (it IS the distinct
    * set), else floor((k−1)·2^60 / h_k) — BigInt keeps the 70-bit
    * product exact (the oracle's HUGEINT floor-division twin).
    */
  def estimate(mins: Seq[Long], k: Int): Long =
    if (mins.length < k) mins.length.toLong
    else ((BigInt(k - 1) << 60) / BigInt(mins.last)).toLong
}
