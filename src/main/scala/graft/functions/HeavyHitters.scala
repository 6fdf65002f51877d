package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a mergeable Spark `Aggregator`:
  * corpus-level frequent-item stats (vocabulary heavy hitters, hot
  * domains, dominant sources) in O(k) memory per partition regardless of
  * corpus size — the alternative to a full `groupBy(term)` whose hash
  * table is vocabulary-sized.
  *
  * Guarantees (the classic ones, preserved under Spark's partial-agg
  * merge): every item with true frequency > n/k survives in the summary,
  * and each reported count undercounts its true frequency by at most
  * n/k (n = total items). When the stream's distinct-item count is at
  * most k−1 the sketch never decrements and the counts are EXACT —
  * which is what the q55 oracle exploits (k chosen above the test
  * vocabulary, so DuckDB's exact GROUP BY replays it bit-for-bit).
  *
  * Scale shape: map-side partial aggregation keeps one bounded map per
  * partition; only k-entry summaries cross the shuffle (the merge
  * subtracts the k-th largest count when the union overflows — the
  * standard mergeable-summaries result, Agarwal et al.).
  */
class MisraGries(k: Int) extends Aggregator[String,
    mutable.Map[String, Long], Map[String, Long]] with Serializable {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long],
                      a: String): mutable.Map[String, Long] = {
    if (a == null) return b
    b.get(a) match {
      case Some(c) => b.update(a, c + 1)
      case None if b.size < k - 1 => b.update(a, 1L)
      case None =>
        // decrement-all step: every tracked counter pays one
        val dead = mutable.ArrayBuffer.empty[String]
        b.foreach { case (key, c) =>
          if (c == 1L) dead += key else b.update(key, c - 1) }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(b1: mutable.Map[String, Long],
                     b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k - 1) {
      // subtract the k-th largest count from every counter, drop <= 0
      val kth = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.foreach { case (key, c) =>
        if (c - kth <= 0) dead += key else b1.update(key, c - kth) }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Column form: aggregate a string column into its Misra–Gries summary
    * (`MAP<STRING, BIGINT>`).
    */
  def misraGries(item: Column, k: Int): Column =
    udaf(new MisraGries(k)).apply(item)
}
