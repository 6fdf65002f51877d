package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** One decoded tile at the scoring boundary: slide key, grid position, and
  * an opaque pixel payload (the multimodal convention — decode produces
  * bytes, the model consumes them).
  */
case class Tile(slide_name: String, tile_col: Int, tile_row: Int,
                payload: Array[Byte])

/** One score row per tile — the exact `(slide key, score1)` schema
  * [[Experiment.evaluate]] consumes.
  */
case class TileScore(slide_name: String, score1: Double)

/** SURVEY §2 I: the CNN tile-scoring stage contract. The reference runs
  * tile batches through a torch model inside its evaluation loop
  * (`functions_v2.py:321-339` feeds batches to the CNNs in
  * `mymodels.py:14-131`); here that boundary is a partition-batch function
  * so a real model plugs in WITHOUT touching the relational pipeline:
  *
  *   - `scorePartition` is called once per executor partition with a
  *     STREAMING iterator of tiles — the shape real inference needs: load
  *     weights once per partition (not per row, not per cluster), run
  *     batched forward passes, stream scores out. Implementations must not
  *     materialize the whole partition.
  *   - The engine side ([[TileScorer.score]]) is one typed `mapPartitions`
  *     — no shuffle, no driver involvement, parallelism = upstream
  *     partitioning (tiles arrive partitioned however the decode stage
  *     left them; at scale that is the parquet scan's splits).
  *
  * Every experiment query consumes scores through this contract (q36), and
  * TileScorerSpec swaps implementations without changing the pipeline.
  */
trait TileScorer extends Serializable {
  def scorePartition(tiles: Iterator[Tile]): Iterator[TileScore]
}

object TileScorer {
  implicit val tileEnc: Encoder[Tile] = Encoders.product[Tile]
  implicit val scoreEnc: Encoder[TileScore] = Encoders.product[TileScore]

  /** Run a scorer over a tile table: one `mapPartitions` pass producing
    * `(slide_name, score1)`.
    */
  def score(tiles: Dataset[Tile], scorer: TileScorer): DataFrame =
    tiles.mapPartitions(scorer.scorePartition _).toDF()

  /** Deterministic fixture "model": interprets the first 8 payload bytes as
    * a big-endian long and scores `value % mod` — a stand-in with the same
    * batch mechanics as real inference (per-partition init, streamed
    * batches) whose output an oracle can replay exactly. Short payloads
    * score 0.
    */
  final case class PayloadModScorer(mod: Long) extends TileScorer {
    override def scorePartition(tiles: Iterator[Tile]): Iterator[TileScore] = {
      // per-partition init happens HERE (once), not per tile — a real
      // implementation loads model weights at this point
      val buf = java.nio.ByteBuffer.allocate(8)
      tiles.map { t =>
        val v =
          if (t.payload != null && t.payload.length >= 8) {
            buf.clear(); buf.put(t.payload, 0, 8); buf.flip(); buf.getLong()
          } else 0L
        TileScore(t.slide_name, java.lang.Math.floorMod(v, mod).toDouble)
      }
    }
  }

  /** Second fixture: constant score — exists so specs can prove scorer
    * swapping changes ONLY the scores, never the pipeline.
    */
  final case class ConstScorer(value: Double) extends TileScorer {
    override def scorePartition(tiles: Iterator[Tile]): Iterator[TileScore] =
      tiles.map(t => TileScore(t.slide_name, value))
  }

  /** A REAL fusion head behind the scorer contract: decodes the payload
    * into the CAT model's image-feature vector, derives the metadata
    * vector from the slide key, and scores the tile with
    * [[graft.ml.FusionModels.Head.catLogits]] (the `FusionNet` concat
    * architecture, mymodels.py:97-131, fixture weights). The emitted score
    * is `floor(scale · (logit1 − logit0))` — INTEGER-VALUED by
    * construction, so downstream per-slide averages are exact in any
    * summation order and the whole pipeline stays oracle-replayable
    * (query q5h). Feature derivations (replayed by the q5h SQL):
    * `img[j] = ((v + j) mod 47 − 23)/16` over the payload long v;
    * `meta = ((c mod 7)/8, (c mod 5)/8, c mod 2)` over the numeric slide
    * key c.
    */
  final case class FusionCatScorer(scale: Double = 1024.0) extends TileScorer {
    override def scorePartition(tiles: Iterator[Tile]): Iterator[TileScore] = {
      // per-partition init: weights materialize once here, like a real
      // model load
      val fix = graft.ml.FusionModels.Fixture
      val buf = java.nio.ByteBuffer.allocate(8)
      tiles.map { t =>
        val v =
          if (t.payload != null && t.payload.length >= 8) {
            buf.clear(); buf.put(t.payload, 0, 8); buf.flip(); buf.getLong()
          } else 0L
        val img = Array.tabulate(fix.ImgDim)(j =>
          (java.lang.Math.floorMod(v + j, 47L) - 23L) / 16.0)
        val c = try t.slide_name.toLong catch { case _: NumberFormatException => 0L }
        val meta = Array((c % 7L) / 8.0, (c % 5L) / 8.0, (c % 2L).toDouble)
        val lg = graft.ml.FusionModels.Head.catLogits(img, meta)
        TileScore(t.slide_name, math.floor((lg(1) - lg(0)) * scale))
      }
    }
  }
}
