package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed by batched per-partition functions.
  *
  * The Spark-side machinery here is real and tested — schema contracts,
  * partition-parallel batch iteration, metadata extraction, frame-sample
  * fan-out. IMAGE decode is real ([[decodeImages]]: `javax.imageio` over the
  * binary payload, exercised end-to-end by the [[synthesizePng]] →
  * [[decodeImages]] round trip in q52 and MultimodalSpec). AUDIO decode is
  * real ([[decodeAudio]]: `javax.sound.sampled` WAV/PCM parsing with exact
  * integer sample statistics, exercised by the [[synthesizeWav]] →
  * [[decodeAudio]] round trip in q5e and MultimodalSpec). VIDEO remains
  * stubbed ([[fakeDecode]] derives deterministic pseudo metadata — this
  * container ships no video codec); swapping in a real one changes only
  * the marked function body.
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

  /** ===== STUB (VIDEO only — images use [[decodeImages]], audio
    * [[decodeAudio]]): replace with a real decoder =====
    * Deterministic fake of codec decoding: header fields derived from the
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

  /** Decoded-image record: dimensions are null when the payload is not a
    * decodable image (decode failure is data, not an exception — a 100 TB
    * crawl always contains corrupt files).
    */
  case class DecodedImage(media_id: Long, media_type: String, n_bytes: Long,
                          width: Option[Int], height: Option[Int],
                          channels: Option[Int])

  /** REAL image decode over the binary `content` column via `javax.imageio`
    * (JPEG/PNG/GIF/BMP — the JDK's built-in codecs; the reference decodes
    * every tile with PIL `Image.open`, dataset_classes_v1.py:61). Same
    * `mapPartitions` iterator shape as [[fakeDecode]]: one decoder per
    * partition, rows streamed through it, no driver involvement. Corrupt or
    * non-image payloads yield null dimensions instead of failing the task.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, mediaType) =>
          val n = if (bytes == null) 0 else bytes.length
          val img =
            if (n == 0) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) DecodedImage(id, mediaType, n.toLong, None, None, None)
          else DecodedImage(id, mediaType, n.toLong, Some(img.getWidth),
            Some(img.getHeight), Some(img.getRaster.getNumBands))
        }
      }
      .toDF()
  }

  /** Deterministic PNG synthesis (executor-side `javax.imageio` encode): one
    * `width`×`height` image per row, pixel values derived from the id. The
    * inverse fixture for [[decodeImages]] — lets an end-to-end
    * encode→binary→decode round trip run on any table, with dimensions an
    * oracle can predict from the id alone.
    */
  def synthesizePng(df: DataFrame, id: String, width: String,
                    height: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // bad input is DATA, not an exception (matching decodeImages' stance):
    // null or non-positive dimensions yield a null payload row instead of
    // crashing the task (BufferedImage throws on w/h <= 0)
    df.select(col(id).cast("long"), col(width).cast("int"), col(height).cast("int"))
      .as[(Long, Option[Int], Option[Int])]
      .mapPartitions { rows =>
        rows.map {
          case (mid, Some(w), Some(h)) if w > 0 && h > 0 =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y, ((mid * 2654435761L + x * 31 + y) & 0xffffff).toInt)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (mid, bos.toByteArray, "image/png")
          case (mid, _, _) => (mid, null: Array[Byte], "image/png")
        }
      }
      .toDF("media_id", "content", "media_type")
  }

  /** Decoded-audio record: format fields + EXACT integer sample statistics
    * (peak = max |sample|, sum of |sample|, strict sign-flip zero
    * crossings) — integers so a SQL oracle can replay them bit-for-bit;
    * nulls when the payload is not decodable audio (corrupt input is data,
    * not an exception).
    */
  case class DecodedAudio(media_id: Long, media_type: String, n_bytes: Long,
                          sample_rate: Option[Int], channels: Option[Int],
                          bits: Option[Int], n_samples: Option[Long],
                          peak: Option[Long], sum_abs: Option[Long],
                          zero_crossings: Option[Long])

  /** REAL audio decode over the binary `content` column via
    * `javax.sound.sampled` (WAV/AIFF/AU — the JDK's built-in parsers; no
    * native codec needed for PCM). Same `mapPartitions` iterator shape as
    * [[decodeImages]]: one decoder per partition, rows streamed through.
    * Supports 16-bit PCM (signed, either endianness); anything the JDK
    * can't parse — or non-16-bit formats — yields null fields.
    *
    * Statistics: `n_samples` counts ALL samples (frames × channels);
    * `peak`/`sum_abs` are channel-agnostic. Zero crossings use the strict
    * sign-product rule (`s[k-1]·s[k] < 0`) along CHANNEL 0 only —
    * interleaved multi-channel samples would compare L[k] against R[k] —
    * exact-integer and replayable in ANSI SQL via a lag window.
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, mediaType) =>
          val n = if (bytes == null) 0 else bytes.length
          val none = DecodedAudio(id, mediaType, n.toLong,
            None, None, None, None, None, None, None)
          if (n == 0) none
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.BufferedInputStream(
                new java.io.ByteArrayInputStream(bytes)))
            try {
              val fmt = ais.getFormat
              val isPcm16 = fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                fmt.getSampleSizeInBits == 16
              if (!isPcm16) none
              else {
                val data = ais.readAllBytes()
                val big = fmt.isBigEndian
                val ch = fmt.getChannels
                val nSamp = data.length / 2
                // peak and sum|s| are channel-agnostic; zero crossings are
                // only meaningful along ONE channel's waveform — interleaved
                // samples would compare L[k] against R[k] — so they walk
                // channel 0 with a frame stride (stride 1 for mono)
                val frameStep = 2 * ch
                var peak = 0L; var sumAbs = 0L; var zc = 0L
                var prev = 0; var i = 0
                while (i + 1 < data.length) {
                  val s =
                    if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
                    else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toInt
                  val a = math.abs(s.toLong)
                  if (a > peak) peak = a
                  sumAbs += a
                  if (i % frameStep == 0) { // channel-0 sample
                    if (i >= frameStep && prev * s < 0) zc += 1
                    prev = s
                  }
                  i += 2
                }
                DecodedAudio(id, mediaType, n.toLong,
                  Some(fmt.getSampleRate.toInt), Some(ch), Some(16),
                  Some(nSamp.toLong), Some(peak), Some(sumAbs), Some(zc))
              }
            } finally ais.close()
          } catch { case _: Exception => none }
        }
      }
      .toDF()
  }

  /** Deterministic mono 16-bit PCM WAV synthesis (pure-JVM header + sample
    * writer): sample k of media `id` is `((id·31 + k·17) mod 201) − 100` —
    * small exact integers a SQL oracle regenerates with the same
    * arithmetic. The inverse fixture for [[decodeAudio]] (the
    * [[synthesizePng]] pattern applied to audio); WAV PCM is lossless, so
    * the decoded statistics are EXACTLY the formula's. Null/negative
    * sample counts yield a null payload row.
    */
  def synthesizeWav(df: DataFrame, id: String, nSamples: String,
                    sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long"), col(nSamples).cast("int"))
      .as[(Long, Option[Int])]
      .mapPartitions { rows =>
        rows.map {
          case (mid, Some(n)) if n > 0 =>
            val dataLen = n * 2
            val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
              .put("WAVE".getBytes("US-ASCII"))
              .put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(1).putShort(1) // PCM, mono
              .putInt(sampleRate).putInt(sampleRate * 2)
              .putShort(2).putShort(16) // block align, bits
              .put("data".getBytes("US-ASCII")).putInt(dataLen)
            var k = 0
            while (k < n) {
              buf.putShort((((mid * 31 + k * 17) % 201) - 100).toShort)
              k += 1
            }
            (mid, buf.array(), "audio/wav")
          case (mid, _) => (mid, null: Array[Byte], "audio/wav")
        }
      }
      .toDF("media_id", "content", "media_type")
  }

  /** Patch/tile grid fan-out: one row per (patchX, patchY) — the tile
    * enumeration shape of the reference's slide pipeline
    * (dataset_classes_v1.py:32-54) generalized to any decoded medium.
    * Pure generator (explode over sequences): no UDF, no shuffle.
    */
  def patchGrid(decoded: DataFrame, patch: Int): DataFrame = {
    require(patch > 0, s"patch size must be positive, got $patch")
    decoded
      .withColumn("px", explode(sequence(lit(0), ceil(col("width") / patch).cast("int") - 1)))
      .withColumn("py", explode(sequence(lit(0), ceil(col("height") / patch).cast("int") - 1)))
  }

  /** Frame sampling for video-like media: every `stride`-th frame index up
    * to n_frames (metadata-driven; no decode needed for planning).
    */
  def sampleFrames(media: DataFrame, nFrames: Column, stride: Int): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
}
