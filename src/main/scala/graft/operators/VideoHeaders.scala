package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM video CONTAINER header parsing and synthesis — the byte-level
  * machinery behind [[Multimodal.decodeVideo]] / [[Multimodal.synthesizeVideo]].
  * Parses the metadata a data pipeline filters and plans on (dimensions,
  * codec fourcc, frame count, duration); frame pixels need a native codec
  * and are out of scope. Formats: MP4 (ISO/IEC 14496-12 box structure) and
  * AVI (RIFF chunks). Both parsers are defensive: every read is
  * bounds-checked and malformed framing returns None, never throws past
  * [[parseMp4]]/[[parseAvi]].
  */
private[graft] object VideoHeaders {

  case class VideoMeta(container: String, codec: Option[String],
                       width: Option[Int], height: Option[Int],
                       nFrames: Option[Long], durationMs: Option[Long])

  // ---------------------------------------------------------------- MP4 --

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) << 32) | u32(b, p + 4)

  /** Boxes whose payload is itself a box sequence (the ones on the path to
    * the metadata we read; unknown boxes are skipped, not descended).
    */
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** None unless the bytes open with an `ftyp` box (the MP4 signature). */
  def parseMp4(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes.length < 12 || fourcc(bytes, 4) != "ftyp") return None
    var timescale = 0L; var duration = -1L
    var width: Option[Int] = None; var height: Option[Int] = None
    var codec: Option[String] = None; var frames: Option[Long] = None

    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val size32 = u32(bytes, p)
        val tp = fourcc(bytes, p + 4)
        val (payload, boxEnd) =
          if (size32 == 1L) { // 64-bit largesize follows the fourcc
            if (p + 16 > end) return
            val sz = u64(bytes, p + 8)
            if (sz < 16 || p + sz > end) return
            (p + 16, p + sz.toInt)
          } else if (size32 == 0L) (p + 8, end) // box extends to end
          else {
            if (size32 < 8 || p + size32 > end) return
            (p + 8, p + size32.toInt)
          }
        tp match {
          case t if Containers(t) => walk(payload, boxEnd)
          case "mvhd" if payload + 4 <= boxEnd =>
            val v = bytes(payload) & 0xff
            if (v == 1 && payload + 32 + 8 <= boxEnd) {
              timescale = u32(bytes, payload + 20)
              duration = u64(bytes, payload + 24)
            } else if (v == 0 && payload + 20 <= boxEnd) {
              timescale = u32(bytes, payload + 12)
              duration = u32(bytes, payload + 16)
            }
          case "tkhd" =>
            val v = bytes(payload) & 0xff
            val off = if (v == 1) 88 else 76 // width offset within payload
            if (payload + off + 8 <= boxEnd) {
              // 16.16 fixed point
              width = Some((u32(bytes, payload + off) >> 16).toInt)
              height = Some((u32(bytes, payload + off + 4) >> 16).toInt)
            }
          case "stsd" if payload + 16 <= boxEnd =>
            // version/flags, entry_count, then the first sample entry:
            // size + format fourcc
            codec = Some(fourcc(bytes, payload + 12))
          case "stts" if payload + 8 <= boxEnd =>
            val n = u32(bytes, payload + 4)
            var total = 0L; var i = 0
            while (i < n && payload + 8 + i * 8 + 8 <= boxEnd) {
              total += u32(bytes, payload + 8 + i * 8)
              i += 1
            }
            if (i == n) frames = Some(total)
          case _ => ()
        }
        p = boxEnd
      }
    }
    walk(0, bytes.length)
    val durMs =
      if (timescale > 0 && duration >= 0) Some(duration * 1000L / timescale)
      else None
    Some(VideoMeta("mp4", codec, width, height, frames, durMs))
  }

  /** Minimal structurally-valid MP4: fixed-size box tree, 1000-unit
    * timescale so duration units ARE milliseconds.
    */
  def writeMp4(width: Int, height: Int, nFrames: Int, frameMs: Int): Array[Byte] = {
    def box(tp: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val b = ByteBuffer.allocate(len)
      b.putInt(len).put(tp.getBytes("US-ASCII"))
      payload.foreach(b.put)
      b.array()
    }
    val durMs = nFrames.toLong * frameMs
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(12)
      b.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")); b.array()
    })
    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(100)
      b.putInt(0)              // version 0 + flags
        .putInt(0).putInt(0)   // ctime, mtime
        .putInt(1000)          // timescale: 1 unit = 1 ms
        .putInt(durMs.toInt)   // duration
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.putInt(0).putInt(0)    // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2)              // next track id
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = ByteBuffer.allocate(84)
      b.putInt(7)              // version 0 + flags: enabled|in-movie
        .putInt(0).putInt(0)   // ctime, mtime
        .putInt(1)             // track id
        .putInt(0)             // reserved
        .putInt(durMs.toInt)   // duration
        .putLong(0)            // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/volume/res
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      b.putInt(width << 16).putInt(height << 16) // 16.16 fixed point
      b.array()
    })
    val stsd = box("stsd", {
      val entry = ByteBuffer.allocate(86) // VisualSampleEntry, no codec config
      entry.putInt(86).put("avc1".getBytes("US-ASCII"))
        .putInt(0).putShort(0)           // 6 reserved bytes
        .putShort(1)                     // data reference index
      (0 until 4).foreach(_ => entry.putInt(0)) // pre_defined/reserved
      entry.putShort(width.toShort).putShort(height.toShort)
        .putInt(0x00480000).putInt(0x00480000) // 72 dpi
        .putInt(0).putShort(1)           // reserved, frame count
      entry.put(new Array[Byte](32))     // compressor name
      entry.putShort(0x18).putShort(-1)  // depth, pre_defined
      val b = ByteBuffer.allocate(8 + 86)
      b.putInt(0).putInt(1).put(entry.array()); b.array()
    })
    val stts = box("stts", {
      val b = ByteBuffer.allocate(16)
      b.putInt(0).putInt(1).putInt(nFrames).putInt(frameMs); b.array()
    })
    val moov = box("moov", mvhd,
      box("trak", tkhd, box("mdia", box("minf", box("stbl", stsd, stts)))))
    ftyp ++ moov
  }

  // ---------------------------------------------------------------- AVI --

  /** None unless the bytes open `RIFF....AVI ` (the AVI signature). */
  def parseAvi(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return None
    var width: Option[Int] = None; var height: Option[Int] = None
    var frames: Option[Long] = None; var durMs: Option[Long] = None
    var codec: Option[String] = None

    def le32(p: Int): Long =
      ByteBuffer.wrap(bytes, p, 4).order(ByteOrder.LITTLE_ENDIAN)
        .getInt() & 0xffffffffL

    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val tp = fourcc(bytes, p)
        val size = le32(p + 4)
        val dataStart = p + 8
        val dataEnd = dataStart + size
        if (size < 0 || dataEnd > end) return
        tp match {
          case "LIST" if size >= 4 => walk(dataStart + 4, dataEnd.toInt)
          case "avih" if size >= 40 =>
            val usPerFrame = le32(dataStart)
            val total = le32(dataStart + 16)
            frames = Some(total)
            width = Some(le32(dataStart + 32).toInt)
            height = Some(le32(dataStart + 36).toInt)
            durMs = Some(total * usPerFrame / 1000L)
          case "strh" if size >= 8 && fourcc(bytes, dataStart) == "vids" =>
            if (codec.isEmpty) codec = Some(fourcc(bytes, dataStart + 4))
          case _ => ()
        }
        // RIFF chunks are word-aligned: odd sizes carry a pad byte
        p = (dataEnd + (size % 2)).toInt
      }
    }
    walk(12, bytes.length)
    Some(VideoMeta("avi", codec, width, height, frames, durMs))
  }

  /** Minimal structurally-valid AVI: hdrl LIST with avih + one vids strl. */
  def writeAvi(width: Int, height: Int, nFrames: Int, usPerFrame: Int): Array[Byte] = {
    def chunk(tp: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(tp.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(listType: String, members: Array[Byte]*): Array[Byte] = {
      val inner = members.flatten.toArray
      val b = ByteBuffer.allocate(12 + inner.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + inner.length)
        .put(listType.getBytes("US-ASCII")).put(inner)
      b.array()
    }
    val avih = chunk("avih", {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
      b.array() // trailing 16 reserved bytes stay zero
    })
    val strh = chunk("strh", {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("mjpg".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1)                    // scale
        .putInt(1000000 / usPerFrame) // rate (fps)
        .putInt(0).putInt(nFrames)
      b.array() // bufsize/quality/samplesize/rcFrame stay zero
    })
    val hdrl = list("hdrl", avih, list("strl", strh))
    val b = ByteBuffer.allocate(12 + hdrl.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(4 + hdrl.length)
      .put("AVI ".getBytes("US-ASCII")).put(hdrl)
    b.array()
  }
}
