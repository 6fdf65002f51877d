package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = ((0 until 900).map(i => ("hot", i.toDouble)) ++
    (0 until 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")

  test("saltedSumCount equals plain groupBy sum/count") {
    val salted = Skew.saltedSumCount(skewed, col("k"), col("v"))
      .select("key", "sum_value", "n").as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(salted(k) == ((s, n)), s"key $k")
    }
  }

  test("saltedSumCount spreads the hot key over multiple partial groups") {
    val partials = skewed
      .select(col("k"), col("v"),
        pmod(hash(monotonically_increasing_id()), lit(16)).as("__salt"))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(partials > 4, s"hot key must hit many salt buckets, got $partials")
  }

  test("saltedBroadcastJoin equals a plain join") {
    val dim = Seq(("hot", 1), ("k0", 2), ("k5", 3)).toDF("k", "tag")
    val salted = Skew.saltedBroadcastJoin(skewed, dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), max("tag").as("t"))
      .as[(String, Long, Int)].collect().toSet
    val plain = skewed.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), max("tag").as("t"))
      .as[(String, Long, Int)].collect().toSet
    assert(salted == plain)
  }
}
