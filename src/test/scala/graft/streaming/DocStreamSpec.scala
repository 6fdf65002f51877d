package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Doc(doc_id: Long, ts: Timestamp, text: String)

class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def corpus = Seq(
    (10L, "already ingested text one"),
    (11L, "already ingested text two")).toDF("doc_id", "text")

  test("streaming ingest gate: corpus dups and stream re-sends drop, fresh docs pass") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStream.dedupedIngest(in.toDF(), corpus)
      .writeStream.format("memory").queryName("doc_sink")
      .outputMode("append").start()
    try {
      in.addData(
        Doc(20L, t(1), "already ingested text one"), // corpus dup -> drop
        Doc(21L, t(2), "brand new text"),
        Doc(22L, t(3), "brand new text"),            // in-batch re-send -> drop
        Doc(23L, t(4), "another new text"))
      q.processAllAvailable()
      in.addData(
        Doc(24L, t(6), "brand new text"),            // cross-batch re-send -> drop
        Doc(25L, t(7), "already ingested text two"), // corpus dup -> drop
        Doc(26L, t(8), "third new text"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("doc_sink").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(21L, 23L, 26L), s"got ${kept.toSeq}")
  }

  test("stream gate matches the batch gate's keeper set on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Seq(
      Doc(20L, t(1), "already ingested text one"),
      Doc(21L, t(2), "brand new text"),
      Doc(22L, t(3), "brand new text"),
      Doc(23L, t(4), "another new text")).toSeq
    val in = MemoryStream[Doc]
    val q = DocStream.dedupedIngest(in.toDF(), corpus)
      .writeStream.format("memory").queryName("doc_sink_parity")
      .outputMode("append").start()
    try { in.addData(batch: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("doc_sink_parity")
      .select("doc_id").as[Long].collect().toSet
    val batched = Dedup.dropDupesAgainst(
        batch.toDF().drop("ts"), corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batched, s"stream $streamed != batch $batched")
  }
}
