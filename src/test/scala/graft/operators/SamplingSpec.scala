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

  test("sampleMixture: nested in the fraction, reproducible, rate near target") {
    val df = spark.range(10000).select(col("id"),
      (col("id") % 2).cast("string").as("src"))
    def run(fA: Double, fB: Double) =
      Sampling.sampleMixture(df, col("src"), col("id"),
        Map("0" -> fA, "1" -> fB)).select("id").as[Long].collect().toSet
    val half = run(0.5, 0.2)
    val more = run(0.8, 0.2)
    assert(half.subsetOf(more), "upweighting must keep previously selected rows")
    assert(run(0.5, 0.2) == half, "must be reproducible")
    val rateA = half.count(_ % 2 == 0) / 5000.0
    assert(math.abs(rateA - 0.5) < 0.05, s"src 0 rate $rateA")
    val rateB = half.count(_ % 2 == 1) / 5000.0
    assert(math.abs(rateB - 0.2) < 0.05, s"src 1 rate $rateB")
    // unlisted group keeps nothing by default
    assert(Sampling.sampleMixture(df, col("src"), col("id"),
      Map("0" -> 1.0)).filter(col("src") === "1").count() == 0)
  }

  test("pseudoRand is overflow-safe for any long key, value-compatible for small keys") {
    val r = spark.range(1).select(
      Sampling.pseudoRand(lit(Long.MaxValue)).as("big"),
      Sampling.pseudoRand(lit(4000000000L)).as("overOldLimit"),
      Sampling.pseudoRand(lit(-7L)).as("neg"),
      Sampling.pseudoRand(lit(123L)).as("small")).collect()(0)
    // the naive key*C form overflows (ANSI error) past ~3.5e9 — these must
    // just produce in-range values
    Seq(0, 1, 2, 3).foreach(i =>
      assert(r.getLong(i) >= 0 && r.getLong(i) < 1000000007L))
    assert(r.getLong(3) == (123L * 2654435761L) % 1000000007L,
      "mod-first form must equal the naive form where the naive form is defined")
  }

  test("seededOrder varies with seed") {
    val a = tiles.orderBy(Sampling.seededOrder(tiles, col("tile"), 1)).select("tile").as[Int].collect()
    val b = tiles.orderBy(Sampling.seededOrder(tiles, col("tile"), 2)).select("tile").as[Int].collect()
    assert(a.toSeq != b.toSeq)
  }
}
