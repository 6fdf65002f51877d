package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // 3 slides with 5, 12, 20 tiles (FIXTURES.md §1.2: k < / = / > group size)
  private def tiles = Seq(
    ("s1", 5), ("s2", 12), ("s3", 20)
  ).toDF("slide", "n")
    .withColumn("tile", explode(sequence(lit(1), col("n"))))
    .drop("n")

  test("takePerGroup keeps exactly min(k, group size) rows per group") {
    val out = Sampling.takePerGroup(tiles, Seq(col("slide")), 12,
      Sampling.pseudoRand(col("tile")))
    val counts = out.groupBy("slide").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s1" -> 5L, "s2" -> 12L, "s3" -> 12L))
  }

  test("k <= 0 keeps everything (reference nr_tiles=0)") {
    assert(Sampling.takePerGroup(tiles, Seq(col("slide")), 0,
      Sampling.pseudoRand(col("tile"))).count() == 37)
  }

  test("sample is deterministic and not simply the first k rows") {
    def sample() = Sampling.takePerGroup(tiles, Seq(col("slide")), 3,
        Sampling.pseudoRand(col("tile")))
      .orderBy("slide", "tile").select("slide", "tile").as[(String, Int)].collect().toSeq
    assert(sample() == sample())
    val s3 = sample().filter(_._1 == "s3").map(_._2)
    assert(s3 != Seq(1, 2, 3), "pseudo-random order should not match insertion order")
  }

  test("seededOrder varies with seed") {
    val a = tiles.orderBy(Sampling.seededOrder(tiles, col("tile"), 1)).select("tile").as[Int].collect()
    val b = tiles.orderBy(Sampling.seededOrder(tiles, col("tile"), 2)).select("tile").as[Int].collect()
    assert(a.toSeq != b.toSeq)
  }
}
