package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed by batched per-partition functions.
  *
  * The Spark-side machinery here is real and tested — schema contracts,
  * partition-parallel batch iteration, metadata extraction, frame-sample
  * fan-out. The actual codec calls are STUBBED (this container has no
  * image/audio libraries): [[fakeDecode]] derives deterministic pseudo
  * metadata from the bytes where a JPEG/PNG decoder would parse headers.
  * Swapping in a real decoder changes only the marked function body.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** Wrap any table into media rows (payload = utf-8 bytes of a text
    * column) — lets the binary pipeline be exercised on the test tables.
    */
  def asMedia(df: DataFrame, id: String, payload: String,
              mediaType: String = "image/fake"): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      col(payload).cast("binary").as("content"),
      lit(mediaType).as("media_type"))

  /** Decoded-media record (the post-decode schema contract). */
  case class DecodedMedia(media_id: Long, media_type: String, n_bytes: Long,
                          width: Int, height: Int, channels: Int,
                          content_hash: Long)

  /** ===== STUB: replace with a real decoder =====
    * Deterministic fake of image decoding: header fields derived from the
    * byte length and first bytes. A real implementation would decode the
    * codec header here (the function signature and per-partition batch shape
    * stay the same). Runs as `mapPartitions` over typed rows — the
    * distributed iterator shape a vectorized/native decode stage uses.
    */
  def fakeDecode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // a real decoder would drain `rows` in fixed-size batches through
        // native code; the iterator contract is identical
        rows.map { case (id, bytes, mediaType) =>
          val n = if (bytes == null) 0 else bytes.length
          val b0 = if (n > 0) bytes(0) & 0xff else 0
          val width = 64 + (n % 192)          // STUB: fake header parse
          val height = 64 + ((n * 7 + b0) % 192)
          var h = 1125899906842597L           // deterministic FNV-ish hash
          var i = 0
          while (i < n) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
          DecodedMedia(id, mediaType, n.toLong, width, height, 3, h)
        }
      }
      .toDF()
  }

  /** Patch/tile grid fan-out: one row per (patchX, patchY) — the tile
    * enumeration shape of the reference's slide pipeline
    * (dataset_classes_v1.py:32-54) generalized to any decoded medium.
    * Pure generator (explode over sequences): no UDF, no shuffle.
    */
  def patchGrid(decoded: DataFrame, patch: Int): DataFrame =
    decoded
      .withColumn("px", explode(sequence(lit(0), ceil(col("width") / patch).cast("int") - 1)))
      .withColumn("py", explode(sequence(lit(0), ceil(col("height") / patch).cast("int") - 1)))

  /** Frame sampling for video-like media: every `stride`-th frame index up
    * to n_frames (metadata-driven; no decode needed for planning).
    */
  def sampleFrames(media: DataFrame, nFrames: Column, stride: Int): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
}
