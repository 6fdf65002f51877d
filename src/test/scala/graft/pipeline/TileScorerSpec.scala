package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §2 I: the tile-scoring stage contract — scorer swap without
  * pipeline changes, payload decode correctness, and streaming (once-per-
  * partition) mechanics.
  */
class TileScorerSpec extends SparkSpec {
  import spark.implicits._
  import TileScorer.tileEnc

  private def tiles(n: Int) = spark.range(n).select(
      concat(lit("s"), (col("id") % 5).cast("string")).as("slide_name"),
      (col("id") % 10).cast("int").as("tile_col"),
      (col("id") % 3).cast("int").as("tile_row"),
      to_binary(lpad(hex(col("id") * 7), 16, "0"), lit("hex")).as("payload"))
    .as[Tile]

  test("PayloadModScorer decodes the payload: score == value % mod") {
    val out = TileScorer.score(tiles(100), TileScorer.PayloadModScorer(13))
      .as[(String, Double)].collect()
    assert(out.length == 100)
    // reconstruct: tile i carried payload i*7, slide s(i%5)
    val bySlide = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val expected = (0 until 100).map(i => (s"s${i % 5}", (i * 7 % 13).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(bySlide == expected)
  }

  test("short or null payloads score 0, not crash") {
    val weird = Seq(
      Tile("a", 0, 0, Array[Byte](1, 2)),
      Tile("b", 0, 0, null),
      Tile("c", 0, 0, Array.fill(8)(0xFF.toByte))). // -1 -> floorMod positive
      toDS()
    val out = TileScorer.score(weird, TileScorer.PayloadModScorer(10))
      .as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 0.0, "b" -> 0.0, "c" -> 9.0))
  }

  test("swapping scorers changes only scores — same pipeline, same schema") {
    val t = tiles(60)
    val a = TileScorer.score(t, TileScorer.PayloadModScorer(100))
    val b = TileScorer.score(t, TileScorer.ConstScorer(0.5))
    assert(a.schema == b.schema)
    assert(a.schema.fieldNames.toSeq == Seq("slide_name", "score1"))
    assert(b.select("score1").distinct().as[Double].collect().toSeq == Seq(0.5))
  }

  test("scorer feeds Experiment.evaluate unchanged (the q36 path)") {
    val meta = (0 until 40).map { i =>
      (s"s$i", i % 2, Some(30.0 + i), Some(i % 2), Some(i % 3))
    }.toDF("slide_name", "label", "age", "gender", "location")
      .withColumn("lab", lit(0))
    val prepared = Experiment.prepare(meta, Experiment.Config())
    // separable fixture: payload carries label*80+10 -> PayloadModScorer(100)
    // scores 10 or 90; threshold 0.5 on the rollup mean separates perfectly
    val t = meta.select(col("slide_name"),
        lit(0).as("tile_col"), lit(0).as("tile_row"),
        to_binary(lpad(hex(col("label") * 80 + 10), 16, "0"), lit("hex")).as("payload"))
      .as[Tile]
    val scores = TileScorer.score(t, TileScorer.PayloadModScorer(100))
    val out = Experiment.evaluate(prepared, scores,
        Experiment.Config(rollupThreshold = 50.0))
      .select("balanced_accuracy", "auroc").as[(Double, Double)].collect()
    assert(out.nonEmpty && out.forall { case (ba, au) => ba == 1.0 && au == 1.0 })
  }

  test("scorePartition is called once per partition (streaming contract)") {
    val calls = spark.sparkContext.longAccumulator("scorerCalls")
    val counting = new TileScorer {
      override def scorePartition(it: Iterator[Tile]): Iterator[TileScore] = {
        calls.add(1)
        it.map(t => TileScore(t.slide_name, 0.0))
      }
    }
    val t = tiles(100).repartition(4)
    assert(TileScorer.score(t, counting).count() == 100)
    assert(calls.value == 4, s"expected 4 partition calls, got ${calls.value}")
  }
}
