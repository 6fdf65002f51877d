package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "tiny"), (3L, "a much longer payload of bytes here"))
      .toDF("id", "payload"), "id", "payload")

  test("asMedia produces the binary payload schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "content", "media_type"))
    assert(media.schema("content").dataType.typeName == "binary")
  }

  test("fakeDecode is deterministic and derives metadata from bytes") {
    val a = Multimodal.fakeDecode(media).orderBy("media_id").collect()
    val b = Multimodal.fakeDecode(media).orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq)
    val r = a(0)
    assert(r.getAs[Long]("n_bytes") == 11L) // "hello world"
    assert(r.getAs[Int]("width") == 64 + 11 % 192)
    assert(r.getAs[Int]("channels") == 3)
    // distinct payloads -> distinct content hashes
    assert(a.map(_.getAs[Long]("content_hash")).distinct.length == 3)
  }

  test("patchGrid fans out ceil(w/p)*ceil(h/p) rows per image") {
    val decoded = Multimodal.fakeDecode(media)
    val grid = Multimodal.patchGrid(decoded, 32)
    val counts = grid.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    val expected = decoded.select(col("media_id"),
        (ceil(col("width") / 32) * ceil(col("height") / 32)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(counts == expected)
  }

  test("sampleFrames emits every stride-th frame index") {
    val df = Seq((1L, 10), (2L, 1)).toDF("media_id", "nf")
    val out = Multimodal.sampleFrames(df, col("nf"), stride = 4)
      .groupBy("media_id").agg(collect_list("frame_idx").as("f"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(0, 4, 8))
    assert(out(2L) == Seq(0))
  }
}
