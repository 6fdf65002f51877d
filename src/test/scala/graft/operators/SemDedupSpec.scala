package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // dim-4, two orthogonal centroids; threshold 0.9 in the tests
  private val cents: Seq[Seq[Double]] = Seq(
    Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))

  private def docs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // cell 0, keeper
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // cell 0, cos(1,2)=0.994 -> dropped
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // equidistant -> tie to cell 0; kept
    (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),   // cell 1, keeper
    (5L, Seq(0.0f, 0.0f, 0.9f, 0.1f)),   // cell 1, cos(4,5)=0.994 -> dropped
    // near-parallel pair STRADDLING the cell boundary: cos(6,7)=0.9999
    // but cells differ -> blocking keeps both (the algorithm's trade)
    (6L, Seq(0.71f, 0.0f, 0.70f, 0.0f)), // cell 0 (0.5741 vs 0.5941)
    (7L, Seq(0.70f, 0.0f, 0.71f, 0.0f)), // cell 1 (0.5941 vs 0.5741)
    (8L, Seq(0.0f, 0.0f, 0.0f, 0.0f))    // zero norm: kept, blocks no one
  ).toDF("vec_id", "embedding")

  test("semDedup: within-cell lower-id rule, tie-to-low-cell assignment, cross-cell pairs survive") {
    val out = Similarity.semDedup(docs, "vec_id", threshold = 0.9, cents)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 0, true), (2L, 0, false), (3L, 0, true),
      (4L, 1, true), (5L, 1, false),
      (6L, 0, true), (7L, 1, true),   // cos 0.9999 but different cells
      (8L, 0, true)))                  // zero-norm: tie cell, always kept
  }

  test("semDedup: threshold gates the drop; zero-norm rows never block") {
    // at threshold 1.0 nothing reaches the bar except exact duplicates
    val none = Similarity.semDedup(docs, "vec_id", threshold = 1.0, cents)
      .filter(!col("kept")).count()
    assert(none == 0L)
    intercept[IllegalArgumentException] {
      Similarity.semDedup(docs, "vec_id", threshold = 0.0, cents)
    }
  }

  test("fitSemDedupCentroids: deterministic refit, bounded sample") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.fitSemDedupCentroids(emb, nClusters = 8)
    val b = Similarity.fitSemDedupCentroids(emb, nClusters = 8)
    assert(a == b, "refit must be bit-identical")
    assert(a.size == 8 && a.forall(_.size == 64))
    intercept[IllegalArgumentException] {
      Similarity.fitSemDedupCentroids(emb, nClusters = 1)
    }
  }

  test("semDedupAgainst: corpus-only comparison, cell blocking, zero-norm conduct") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // cell 0
      (11L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),  // cell 1
      (12L, Seq(0.70f, 0.0f, 0.71f, 0.0f)) // cell 1 (boundary straddler)
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (1L, Seq(0.95f, 0.05f, 0.0f, 0.0f)), // cell 0, cos(.,10)=0.9986 -> drop
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // tie cell 0, no corpus mate -> keep
      // cell 0, cos(.,12)=0.9999 but 12 is in cell 1 -> blocking keeps it
      (3L, Seq(0.71f, 0.0f, 0.70f, 0.0f)),
      // batch-INTERNAL near-dup of doc 2 (cos 0.9986, same cell 0) — the
      // gate compares against the corpus only, so both 2 and 5 survive
      (5L, Seq(0.05f, 0.95f, 0.0f, 0.0f)),
      (6L, Seq(0.0f, 0.0f, 0.0f, 0.0f))    // zero norm -> kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedupAgainst(batch, corpus, "vec_id",
        threshold = 0.9, cents)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 0, false), (2L, 0, true), (3L, 0, true),
      (5L, 0, true), (6L, 0, true)))
    val plan = Similarity.semDedupAgainst(batch, corpus, "vec_id", 0.9, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("compactSemCellTable: multiset preserved, one segment remains, gate unchanged, guards") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (12L, Seq(0.70f, 0.0f, 0.71f, 0.0f))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (1L, Seq(0.95f, 0.05f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.71f, 0.0f, 0.70f, 0.0f))
    ).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("semcompact").toString + "/cells"
    Similarity.writeSemCellSegment(corpus.where(col("vec_id") =!= 12),
      "vec_id", cents, root, "corpus")
    Similarity.writeSemCellSegment(corpus.where(col("vec_id") === 12),
      "vec_id", cents, root, "b3")
    def rows(p: String) = spark.read.parquet(p)
      .select(col("vec_id"), col("cell").cast("int"),
        col("embedding").cast("array<float>"))
      .collect().map(_.toString).sorted.toSeq
    def gate(p: String) = Similarity.semDedupAgainstCells(batch, "vec_id",
        spark.read.parquet(p), threshold = 0.9, cents)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val before = rows(root)
    val gateBefore = gate(root)
    // a mid-crash reader may see old + combined (duplicated rows): the
    // gate decision must be duplication-insensitive
    Similarity.writeSemCellSegment(corpus, "vec_id", cents, root, "dup")
    assert(gate(root) == gateBefore, "duplicated state rows changed the gate")
    def rm(p: java.nio.file.Path): Unit =
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.delete(f); () })
    rm(java.nio.file.Paths.get(s"$root/seg=dup"))
    // DEFAULT (live-stream-safe) compaction: the highest-numbered b*
    // segment is the possibly-uncommitted in-flight batch — it stays
    // unfolded so its crash replay's own-segment exclusion keeps working
    Similarity.compactSemCellTable(spark, root, "corpus1")
    assert(rows(root) == before, "compaction changed the row multiset")
    assert(gate(root) == gateBefore, "compaction changed the gate")
    val segs1 = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("seg=")).sorted.toSeq
    assert(segs1 == Seq("seg=b3", "seg=corpus1"),
      s"default compaction must keep the latest b* segment: $segs1")
    // QUIESCED full fold: everything (including b3 and the previous
    // compacted segment) collapses into one segment
    Similarity.compactSemCellTable(spark, root, "corpus2",
      keepLatestBatchSeg = false)
    assert(rows(root) == before, "full fold changed the row multiset")
    assert(gate(root) == gateBefore, "full fold changed the gate")
    val segs = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("seg=")).toSeq
    assert(segs == Seq("seg=corpus2"), s"old segments survive: $segs")
    // a root whose ONLY segment is the in-flight batch: default compaction
    // is a safe no-op
    val root2 = java.nio.file.Files.createTempDirectory("semcompact2")
      .toString + "/cells"
    Similarity.writeSemCellSegment(corpus, "vec_id", cents, root2, "b5")
    Similarity.compactSemCellTable(spark, root2, "corpus1")
    val segs2 = new java.io.File(root2).listFiles()
      .map(_.getName).filter(_.startsWith("seg=")).toSeq
    assert(segs2 == Seq("seg=b5"), s"lone in-flight segment folded: $segs2")
    // guards: existing target, b* namespace, empty root
    intercept[IllegalArgumentException] {
      Similarity.compactSemCellTable(spark, root, "corpus2")
    }
    intercept[IllegalArgumentException] {
      Similarity.compactSemCellTable(spark, root, "b9")
    }
  }

  test("refitSemCellTable: re-blocking flips the straddling pair, multiset kept, baseline restarts, guard, crash windows") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // old cell 0; new cell 0
      (11L, Seq(0.70f, 0.0f, 0.71f, 0.0f)), // old cell 1; NEW cell 0
      (12L, Seq(0.0f, 1.0f, 0.0f, 0.0f))    // old cell 0 (tie); new cell 1
    ).toDF("vec_id", "embedding")
    // the batch row is near-parallel to 11 (cos=0.9999) but the OLD
    // blocking cells them apart (batch -> cell 0, 11 -> cell 1): kept.
    // The refit centroids cell them TOGETHER: dropped. The flip is the
    // old-table-survived discriminator.
    val batch = Seq((1L, Seq(0.71f, 0.0f, 0.70f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents2: Seq[Seq[Double]] = Seq(
      Seq(0.7, 0.0, 0.7, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val dir = java.nio.file.Files.createTempDirectory("semrefit").toString
    val root = s"$dir/cells"
    Similarity.writeSemCellSegment(corpus.where(col("vec_id") =!= 11L),
      "vec_id", cents, root, "corpus")
    Similarity.writeSemCellSegment(corpus.where(col("vec_id") === 11L),
      "vec_id", cents, root, "b3")
    Similarity.writeSemDriftSidecar(spark, root, corpus, cents)
    def gate(c: Seq[Seq[Double]]) =
      Similarity.semDedupAgainstCells(batch, "vec_id",
          spark.read.parquet(root), threshold = 0.9, c)
        .select("vec_id", "kept").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(gate(cents) == Seq((1L, true)),
      "old blocking must keep the straddling batch row")
    // the stream that wrote b3 is quiesced here — the refit folds all
    Similarity.refitSemCellTable(spark, root, cents2)
    val segs = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("seg=")).toSeq
    assert(segs == Seq("seg=corpus"), s"refit must leave one segment: $segs")
    // row multiset preserved, cells re-assigned to the new blocking
    val rows = spark.read.parquet(root)
      .select(col("vec_id"), col("cell").cast("int")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(rows == Seq((10L, 0), (11L, 0), (12L, 1)),
      s"re-blocked assignment wrong: $rows")
    assert(gate(cents2) == Seq((1L, false)),
      "the refit blocking must drop the straddling batch row")
    // the drift clock restarted: baseline == a fresh build + sidecar of
    // the SAME rows under the new centroids
    Similarity.writeSemCellSegment(corpus, "vec_id", cents2,
      s"$dir/fresh", "corpus")
    Similarity.writeSemDriftSidecar(spark, s"$dir/fresh", corpus, cents2)
    def buildRow(p: String) =
      Similarity.semDriftStats(spark, p, batch, cents2)
        .where(col("src") === "build").collect()
        .map(r => (r.getLong(1), r.getLong(2))).head
    assert(buildRow(root) == buildRow(s"$dir/fresh"),
      "swapped drift baseline != fresh baseline")
    // geometry-mismatched refit refuses loudly, live table untouched
    val e = intercept[IllegalArgumentException] {
      Similarity.refitSemCellTable(spark, root,
        Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)))
    }
    assert(e.getMessage.contains("row-count drift"), e.getMessage)
    assert(gate(cents2) == Seq((1L, false)), "refused refit touched the table")
    // mid-swap window: root absent between the renames — loud fail; a
    // re-run rolls BACK and refits
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$root.refit_old")
    assert(fs.rename(rootP, old))
    intercept[Exception] { gate(cents2) }
    Similarity.refitSemCellTable(spark, root, cents2)
    assert(gate(cents2) == Seq((1L, false)), "roll-back recovery diverged")
    // roll-FORWARD window: a witness-complete staging survives with the
    // root renamed out — a re-run promotes it first, then refits
    val tmp = s"$root.refit_tmp"
    Similarity.writeSemCellSegment(corpus, "vec_id", cents2, tmp, "corpus")
    Similarity.writeSemDriftSidecar(spark, tmp, corpus, cents2)
    assert(fs.rename(rootP, old))
    Similarity.refitSemCellTable(spark, root, cents2)
    assert(gate(cents2) == Seq((1L, false)), "roll-forward recovery diverged")
    val stray = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("cells.")).toSeq
    assert(stray.isEmpty, s"recovery left stray swap dirs: $stray")
  }

  test("semDriftStats: hand-computed sums, drifted-batch discrimination, sidecar-bound, refusals") {
    // min fixed-point distance to the nearest centroid (the shared grid)
    def minD(v: Seq[Float]): Long = cents.map(c =>
      v.indices.map { i =>
        val d = v(i).toDouble - c(i)
        graft.expressions.BigramLmScore.halfUp(1e9 * (d * d))
      }.sum).min
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (11L, Seq(0.0f, 0.0f, 1.1f, 0.1f)),
      (12L, Seq(1.0f, 0.0f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("semdrift").toString + "/cells"
    Similarity.writeSemCellSegment(corpus, "vec_id", cents, root, "corpus")
    // a missing sidecar refuses with a clear message
    val inDist = Seq((50L, Seq(0.95f, 0.05f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.semDriftStats(spark, root, inDist, cents)
    }
    assert(e.getMessage.contains("predates drift stats"), e.getMessage)
    Similarity.writeSemDriftSidecar(spark, root, corpus, cents)
    // the sidecar must not disturb segment reads (underscore-invisible)
    assert(spark.read.parquet(root).count() == 3)
    // hand-computed integer sums, both rows
    val drifted = Seq(
      (50L, Seq(0.95f, 0.05f, 0.0f, 0.0f)),
      (51L, Seq(4.0f, 4.0f, 4.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semDriftStats(spark, root, drifted, cents)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val buildSum = Seq(Seq(0.9f, 0.1f, 0.0f, 0.0f),
      Seq(0.0f, 0.0f, 1.1f, 0.1f), Seq(1.0f, 0.0f, 0.1f, 0.0f)).map(minD).sum
    val batchSum = minD(Seq(0.95f, 0.05f, 0.0f, 0.0f)) +
      minD(Seq(4.0f, 4.0f, 4.0f, 4.0f))
    assert(out.toSeq == Seq(("batch", 2L, batchSum), ("build", 3L, buildSum)))
    // the refit signal discriminates: drifted batch mean > build mean,
    // in-distribution batch mean does not
    assert(batchSum / 2 > buildSum / 3)
    val inOut = Similarity.semDriftStats(spark, root, inDist, cents)
      .orderBy("src").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(inOut(0)._2 / inOut(0)._1 <= buildSum / 3,
      "in-distribution batch must not read as drifted")
    // the build row comes from the SIDECAR: a doctored stat surfaces
    // verbatim (the q6z oracle's recompute would break the hash)
    val p = new org.apache.hadoop.fs.Path(s"$root/_drift.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    try o.write(s"""{"fmt": 1, "statN": 3, "statSumNano": 777}""".getBytes)
    finally o.close()
    val doctored = Similarity.semDriftStats(spark, root, inDist, cents)
      .where(col("src") === "build").collect().head.getLong(2)
    assert(doctored == 777L, s"build row must come from the sidecar: $doctored")
  }

  test("semDedup plan: the pair test is a cell equi-join, never corpus all-pairs") {
    val plan = Similarity.semDedup(docs, "vec_id", threshold = 0.9, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
