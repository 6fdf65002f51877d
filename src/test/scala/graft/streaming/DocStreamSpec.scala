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

  test("checkpoint recovery: kill/restart mid-stream drops nothing, dups nothing") {
    // exactly-once across a crash: parquet sink + real checkpoint dir,
    // stop the query between micro-batches, restart from the SAME
    // checkpoint, and require (a) the within-stream dedup STATE survived
    // (a post-restart re-send still drops) and (b) the final keeper set
    // equals the batch gate run over everything — no loss, no dups.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-docrec").toString
    val in = MemoryStream[Doc]
    def start() = DocStream.dedupedIngest(in.toDF(), corpus)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    val batch1 = Seq(
      Doc(20L, t(1), "already ingested text one"), // corpus dup -> drop
      Doc(21L, t(2), "brand new text"),
      Doc(22L, t(3), "another new text"))
    val batch2 = Seq(
      Doc(23L, t(5), "brand new text"),            // re-send ACROSS restart
      Doc(24L, t(6), "already ingested text two"), // corpus dup -> drop
      Doc(25L, t(7), "post-restart fresh text"))
    val q1 = start()
    try { in.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()                               // recover from checkpoint
    try { in.addData(batch2: _*); q2.processAllAvailable() } finally q2.stop()
    val survived = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survived == survived.distinct, s"duplicated rows after recovery: $survived")
    val batched = Dedup.dropDupesAgainst(
        (batch1 ++ batch2).toDF().drop("ts"), corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survived == batched,
      s"recovered stream $survived != batch gate $batched")
  }

  test("streaming NEAR-dup gate: LSH probe per micro-batch equals the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-neargate").toString
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "completely different historical document about particle physics and gauge theory"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeBandTable(corpus, "doc_id", "text",
      "near_gate_bands", buckets = 4, bands = 16, rowsPerBand = 2,
      path = Some(s"$dir/bands"))
    try {
      val b1 = Seq(
        Doc(20L, t(1), "the quick brown fox jumps over the lazy dog near the river bank today extra"),
        Doc(21L, t(2), "genuinely novel streaming content about astronomy and telescopes"))
      val b2 = Seq(
        Doc(22L, t(3), "completely different historical document about particle physics and gauge theory plus"),
        Doc(23L, t(4), "another genuinely fresh document mentioning entirely new things"))
      val in = MemoryStream[Doc]
      val q = DocStream.nearDedupedIngest(in.toDF(), corpus,
        "near_gate_bands", "doc_id", "text",
        s"$dir/out", s"$dir/ckpt", threshold = 0.5,
        bands = 16, rowsPerBand = 2)
      try {
        in.addData(b1: _*); q.processAllAvailable()
        in.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(s"$dir/out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val batched = graft.operators.Dedup.dropNearDupesAgainst(
          (b1 ++ b2).toDF().drop("ts"), corpus, "doc_id", "text",
          threshold = 0.5, bands = 16, rowsPerBand = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batched,
        s"stream near-gate $streamed != batch near-gate $batched")
      assert(streamed == Seq(21L, 23L), s"near-dups must drop, got $streamed")
    } finally spark.sql("DROP TABLE IF EXISTS near_gate_bands")
  }

  test("self-maintaining gate drops cross-batch near-dups the static gate passes") {
    val nearCorpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val novel = "a planted novel document describing underwater cave systems " +
      "and the slow formation of limestone structures over geological time"
    // even id -> replay batch 0 (novel, survives); odd id -> batch 1
    // (near-dup of the batch-0 SURVIVOR — only a state-growing gate drops it)
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today extra"),
      (200L, novel),
      (201L, novel + " appended tail"))
      .toDF("doc_id", "text")
    def freshTable(name: String): String = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Dedup.writeBandTable(nearCorpus, "doc_id", "text", name,
        buckets = 4, bands = 16, rowsPerBand = 2)
      name
    }
    val work = java.nio.file.Files.createTempDirectory("graft-selfm").toString
    try {
      val static = DocStream.replayNearDedupedIngest(batch, nearCorpus,
          freshTable("selfm_static"), "doc_id", "text", s"$work/static",
          nBatches = 2, threshold = 0.5, bands = 16, rowsPerBand = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(static == Seq(200L, 201L),
        s"static gate keeps both planted docs, got $static")
      val selfm = DocStream.replaySelfMaintainingIngest(batch, nearCorpus,
          freshTable("selfm_grow"), "doc_id", "text", s"$work/grow",
          nBatches = 2, threshold = 0.5, bands = 16, rowsPerBand = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(selfm == Seq(200L),
        s"self-maintaining gate must drop the cross-batch near-dup, got $selfm")
      // replaying over the ALREADY-GROWN table is exact: the batch
      // compares against strictly prior state, so its own appended bands
      // (same ids) are excluded and the result is unchanged
      val again = DocStream.replaySelfMaintainingIngest(batch, nearCorpus,
          "selfm_grow", "doc_id", "text", s"$work/grow",
          nBatches = 2, threshold = 0.5, bands = 16, rowsPerBand = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(again == selfm, s"replay over grown state diverged: $again")
    } finally {
      spark.sql("DROP TABLE IF EXISTS selfm_static")
      spark.sql("DROP TABLE IF EXISTS selfm_grow")
    }
  }

  test("self-maintaining EXACT gate: cross-batch copies drop, sink anchors make replays exact") {
    val corpus = Seq((10L, "historical text alpha")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "historical text alpha"),     // corpus dup -> drops round 0
      (200L, "novel text beta"),           // even -> batch 0, survives
      (201L, "novel text beta"),           // odd -> batch 1: exact copy of a SURVIVOR
      (202L, "novel text gamma"),          // in-batch pair with 204:
      (204L, "novel text gamma"),          //   keep-lowest-id -> 202 only
      (203L, "novel text delta")           // odd, novel -> survives
    ).toDF("doc_id", "text")
    def freshTable(name: String): String = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Dedup.writeFingerprintTable(corpus, "text", name, buckets = 4)
      name
    }
    val work = java.nio.file.Files.createTempDirectory("graft-exsm").toString
    // per-batch-INDEPENDENT probing (no append) passes the cross-batch
    // copy — the discrimination a growing fp table provides
    val independent = batch
      .withColumn("__b", pmod(col("doc_id"), lit(2L)))
    val indKept = Seq(0L, 1L).flatMap { b =>
      Dedup.dropDupesAgainstTable(
          independent.where(col("__b") === b).drop("__b"),
          freshTable("exsm_static"), "doc_id", "text")
        .select("doc_id").as[Long].collect()
    }.sorted
    assert(indKept == Seq(200L, 201L, 202L, 203L), s"got $indKept")
    // the self-maintaining gate drops 201 (a batch-0 survivor's copy)
    val grown = DocStream.replaySelfMaintainingExactIngest(batch,
        freshTable("exsm_grow"), "doc_id", "text", s"$work/grow",
        nBatches = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(grown == Seq(200L, 202L, 203L), s"got $grown")
    // repeat replay over the GROWN table + intact sink is bit-stable:
    // committed sink partitions anchor the result (re-probing would
    // self-match and drop everything — the exact axis has no provenance
    // to exclude by)
    val again = DocStream.replaySelfMaintainingExactIngest(batch,
        "exsm_grow", "doc_id", "text", s"$work/grow", nBatches = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == grown, s"replay over grown state diverged: $again")
    spark.sql("DROP TABLE IF EXISTS exsm_static")
    spark.sql("DROP TABLE IF EXISTS exsm_grow")
  }

  test("self-maintaining SEMANTIC gate drops cross-batch twins the static gate passes") {
    import graft.operators.Similarity
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val corpus = Seq((10L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (100L, Seq(0.8f, 0.6f)),  // cos 0.8 vs corpus -> drops in round 0
      (200L, Seq(0.0f, 1.0f)),  // even -> replay batch 0; novel, survives
      (201L, Seq(0.0f, 1.0f)),  // odd -> batch 1: a twin of the 200 SURVIVOR
      (202L, Seq(0.0f, 0.0f)),  // zero-norm, batch 0: kept, never blocks
      (203L, Seq(0.0f, 0.0f))   // zero-norm, batch 1: kept though 202 is in state
    ).toDF("vec_id", "embedding")
    // the static gate (q6o semantics): state never grows -> 201 passes
    val static = Similarity.semDedupAgainst(batch, corpus, "vec_id",
        threshold = 0.7, cents)
      .where(col("kept")).select("vec_id").as[Long].collect().sorted.toSeq
    assert(static == Seq(200L, 201L, 202L, 203L), s"got $static")
    val work = java.nio.file.Files.createTempDirectory("graft-semsm").toString
    Similarity.writeSemCellSegment(corpus, "vec_id", cents,
      s"$work/cells", "corpus")
    val grown = DocStream.replaySemGatedIngest(batch, s"$work/cells",
        "vec_id", cents, threshold = 0.7, s"$work/replay", nBatches = 2)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(grown == Seq(200L, 202L, 203L),
      s"self-maintaining gate must drop the cross-batch twin, got $grown")
    // a second replay over the SAME cell root is bit-identical: stale
    // survivor segments are cleared and each batch compares against
    // strictly prior state (crash/replay idempotency)
    val again = DocStream.replaySemGatedIngest(batch, s"$work/cells",
        "vec_id", cents, threshold = 0.7, s"$work/replay", nBatches = 2)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(again == grown, s"replay over reused cell root diverged: $again")
    // the scale contract behind the state read: the cell-partitioned
    // layout prunes to the probed cells
    val scan = spark.read.parquet(s"$work/cells")
      .filter(col("cell").isin(1)).queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("cell"), scan)
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

  test("streaming ppl gate == batch pplGate; batch split cannot change it") {
    val fitDocs = Seq(
      (1L, "a b a b"), (2L, "a b a a"), (3L, "a b a b a"), (4L, "z z q")
    ).toDF("doc_id", "text")
    val m = graft.ml.NgramLm.fit(fitDocs, col("text"), 10, 10)
      .asInstanceOf[graft.ml.NgramLm.BigramLm]
    // threshold splits the set: in-model docs pass, junk drops
    val cut = 5.0
    val expected = graft.ml.NgramLm.pplGate(fitDocs, col("doc_id"),
        col("text"), m, cut)
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty && expected.size < 4, s"must split: $expected")
    val dir = java.nio.file.Files
      .createTempDirectory("ppl_stream_gate").toString
    def run(nBatches: Int, tag: Int) = DocStream.replayPplGatedIngest(
        fitDocs, m, "doc_id", "text", s"$dir/$tag", nBatches, cut)
      .select("doc_id").as[Long].collect().toSet
    // 1, 2 and 4 micro-batches all reproduce the batch gate exactly —
    // the filter is stateless per-row, so batching is invisible
    assert(run(1, 1) == expected)
    assert(run(2, 2) == expected)
    assert(run(4, 3) == expected)
  }

  test("streaming quality gate == batch margin filter; batch split cannot change it") {
    val train = (Seq("the cat sat on the mat", "a dog ran over the hill",
        "the bird flew above the trees", "cats and dogs play here")
        .zipWithIndex.map { case (t, i) => (i.toLong, t, 1.0) } ++
      Seq("zorp blick frum glorp nix", "blick nix zorp frum wex",
        "glorp wex nix blick zorp", "frum zorp wex glorp blick")
        .zipWithIndex.map { case (t, i) => (100L + i, t, 0.0) })
      .toDF("doc_id", "text", "y")
    val m = graft.ml.TextClassifier.export(
      graft.ml.TextClassifier.fit(train, "text", "y", k = 32))
    val expected = graft.ml.TextClassifier.score(m, train, "text")
      .filter(col("margin") >= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty && expected.size < 8, s"must split: $expected")
    val dir = java.nio.file.Files
      .createTempDirectory("quality_stream_gate").toString
    def run(nBatches: Int, tag: Int) = DocStream.replayQualityGatedIngest(
        train, m, "doc_id", "text", s"$dir/$tag", nBatches,
        minMargin = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(run(1, 1) == expected)
    assert(run(2, 2) == expected)
    assert(run(4, 3) == expected)
  }

  test("streaming DSIR gate == batch threshold filter; batch split cannot change it") {
    val target = Seq((100L, "alpha beta alpha"), (101L, "alpha beta"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"),   // target-like -> passes the 0 bar
      (2L, "delta epsilon zeta"), // raw-like -> negative logw, drops
      (3L, "alpha beta gamma"),
      (4L, "epsilon delta delta")
    ).toDF("doc_id", "text")
    val m = graft.ml.Dsir.fit(target, raw, "text", buckets = 64)
    val expected = graft.ml.Dsir.scores(raw, "doc_id", "text", m)
      .filter(col("logw_micro") >= 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty && expected.size < 4, s"must split: $expected")
    val dir = java.nio.file.Files
      .createTempDirectory("dsir_stream_gate").toString
    def run(nBatches: Int, tag: Int) = DocStream.replayDsirGatedIngest(
        raw, m, "doc_id", "text", s"$dir/$tag", nBatches,
        minLogwMicro = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(run(1, 1) == expected)
    assert(run(2, 2) == expected)
    assert(run(4, 3) == expected)
  }
}
