package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // N=4, Σdl=9, avgdl=2.25; df(spark)=2, df(merge)=2
  private def docs = Seq(
    (1L, "spark merge spark"), // dl=3, tf(spark)=2, tf(merge)=1
    (2L, "merge"),             // dl=1, tf(merge)=1
    (3L, "a b c"),             // dl=3, no query terms
    (4L, "spark a")            // dl=2, tf(spark)=1
  ).toDF("doc_id", "text")

  // the operator's exact op order, k1=1.25 b=0.75
  private def contrib(idf: Double, tf: Long, dl: Long, avgdl: Double): Long =
    graft.expressions.BigramLmScore.halfUp(1e6 *
      (idf * (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * dl / avgdl))))

  test("bm25TopK: hand-computed scores, matched counts, no-match drop") {
    val out = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark", "merge"), k = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0) // both terms: ln 2
    val avgdl = 9.0 / 4.0
    val d1 = contrib(idf, 2, 3, avgdl) + contrib(idf, 1, 3, avgdl)
    val d2 = contrib(idf, 1, 1, avgdl)
    val d4 = contrib(idf, 1, 2, avgdl)
    assert(out.toSeq == Seq((1L, 2L, d1), (2L, 1L, d2), (4L, 1L, d4)))
    // shorter docs outscore longer ones at equal tf (length normalization)
    assert(d2 > d4)
  }

  test("bm25TopK: k truncates on the (score desc, doc_id) total order") {
    val top = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark", "merge"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    // doc 1 (2 matched terms) first, then doc 2 (best single-term score)
    assert(top == Seq(1L, 2L))
  }

  test("bm25TopK: scoring plan is join-free; empty corpus yields empty") {
    val plan = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val empty = Retrieval.bm25TopK(docs.limit(0), col("doc_id"), col("text"),
      Seq("spark"), k = 5)
    assert(empty.columns.toSeq == Seq("doc_id", "matched", "score"))
    assert(empty.count() == 0)
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, col("doc_id"), col("text"), Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark", "spark"), 5)
    }
  }

  test("bm25TopK: the stats persist is call-scoped — no cached frame survives") {
    // drain any cache left by other suites sharing the session first
    spark.sharedState.cacheManager.clearCache()
    val out = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("spark", "merge"), k = 10)
    assert(out.count() == 3) // result stays usable after the unpersist
    assert(spark.sharedState.cacheManager.isEmpty,
      "bm25TopK leaked a cached frame past its own call")
    // and the empty-corpus early return releases it too
    Retrieval.bm25TopK(docs.limit(0), col("doc_id"), col("text"),
      Seq("spark"), k = 5).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("bm25TopKFromStats: stats-served == live fit, absent-term df=0, bucket-pruned lookup, refusals") {
    Retrieval.writeBm25StatsTable(docs, col("doc_id"), col("text"),
      "bm25_stats_t", buckets = 2)
    try {
      // served == live, including a term absent from the corpus (df=0)
      val terms = Seq("spark", "merge", "absentterm")
      val live = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
          terms, k = 10)
        .collect().map(_.toString).sorted.toSeq
      val served = Retrieval.bm25TopKFromStats(docs, col("doc_id"),
          col("text"), "bm25_stats_t", terms, k = 10)
        .collect().map(_.toString).sorted.toSeq
      assert(served == live, s"stats-served diverged:\n$served\nvs\n$live")
      // the df lookup is DRIVER-DIRECT (no Spark job): the map matches
      // the catalog-scan values exactly, absent terms stay absent, and
      // the bucket-id arithmetic agrees with where the writer actually
      // placed each term (prune correctness — a wrong bucket id would
      // silently read df=0)
      val cat = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("bm25_stats_t"))
      val direct = Retrieval.readStatsDfMap(spark, cat, terms)
      val viaScan = spark.table("bm25_stats_t")
        .filter(col("term").isin(terms: _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(direct == viaScan, s"driver-direct $direct != scan $viaScan")
      assert(!direct.contains("absentterm"))
      val nJobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      Retrieval.readStatsDfMap(spark, cat, terms)
      assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
        == nJobsBefore, "the driver-direct lookup must not run a Spark job")
      // and the WHOLE serve is exactly one job: the kernel scan into the
      // ordered limit — no fit job, no lookup job, no plan-side filter
      // re-running the kernel (the round-15 pushdown hazard). Parquet-
      // backed corpus: a local Seq relation would constant-fold.
      val pdir = java.nio.file.Files.createTempDirectory("bm25_serve_plan")
      docs.write.mode("overwrite").parquet(pdir.toString)
      val pdocs = spark.read.parquet(pdir.toString)
      val before2 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      Retrieval.bm25TopKFromStats(pdocs, col("doc_id"), col("text"),
        "bm25_stats_t", terms, k = 10)
      val after2 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      assert(after2 == before2 + 1,
        s"stats-served BM25 must cost exactly ONE job, ran ${after2 - before2}")
      // the returned scoring plan is a single scan into the ordered
      // limit — no joins and no aggregate (the saved fit pass)
      val splan = Retrieval.bm25TopKFromStats(docs, col("doc_id"),
          col("text"), "bm25_stats_t", terms, k = 10)
        .queryExecution.executedPlan.toString
      assert(!splan.contains("Join") && !splan.contains("HashAggregate"),
        splan)
      // the stats table is compactable like every other gate-state table
      Dedup.compactBucketedTable(spark, "bm25_stats_t")
      val postCompact = Retrieval.bm25TopKFromStats(docs, col("doc_id"),
          col("text"), "bm25_stats_t", terms, k = 10)
        .collect().map(_.toString).sorted.toSeq
      assert(postCompact == live, "compaction changed the served scores")
      // a table without the stats properties refuses
      docs.select(col("text").as("term"), col("doc_id").as("df"))
        .write.mode("overwrite").bucketBy(2, "term").format("parquet")
        .saveAsTable("bm25_noprops")
      val e = intercept[IllegalArgumentException] {
        Retrieval.bm25TopKFromStats(docs, col("doc_id"), col("text"),
          "bm25_noprops", terms, k = 10)
      }
      assert(e.getMessage.contains("not a BM25 stats table"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bm25_stats_t")
      spark.sql("DROP TABLE IF EXISTS bm25_noprops")
    }
  }

  test("mergeBm25StatsTable: merge == rebuild, idempotent replay, all crash windows recover") {
    val corpus = docs.where(col("doc_id") <= 2)
    val batch = docs.where(col("doc_id") > 2)
    def tableRows(t: String): Map[String, Long] =
      spark.table(t).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def tableProps(t: String): (Long, Long) = {
      val cat = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      (cat.properties("graft.n").toLong, cat.properties("graft.len").toLong)
    }
    val dirRoot = java.nio.file.Files.createTempDirectory("bm25merge").toString
    try {
      // reference: a whole rebuild over corpus ∪ batch
      Retrieval.writeBm25StatsTable(docs, col("doc_id"), col("text"),
        "bm25_m_ref", buckets = 2, path = Some(s"$dirRoot/ref"))
      val refRows = tableRows("bm25_m_ref")
      val refProps = tableProps("bm25_m_ref")
      // merge path: build over the corpus, merge the batch
      Retrieval.writeBm25StatsTable(corpus, col("doc_id"), col("text"),
        "bm25_m_t", buckets = 2, path = Some(s"$dirRoot/t"))
      Retrieval.mergeBm25StatsTable(batch, col("text"), "bm25_m_t", "b1")
      assert(tableRows("bm25_m_t") == refRows, "merge != rebuild rows")
      assert(tableProps("bm25_m_t") == refProps, "merge != rebuild props")
      // replaying the SAME batch tag is a no-op
      Retrieval.mergeBm25StatsTable(batch, col("text"), "bm25_m_t", "b1")
      assert(tableRows("bm25_m_t") == refRows && tableProps("bm25_m_t") == refProps,
        "tag replay must be a no-op")
      // served scores from the merged table == live fit on corpus ∪ batch
      val live = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark", "merge"), k = 10).collect().map(_.toString).sorted.toSeq
      val served = Retrieval.bm25TopKFromStats(docs, col("doc_id"),
          col("text"), "bm25_m_t", Seq("spark", "merge"), k = 10,
          expectedN = Some(4L))
        .collect().map(_.toString).sorted.toSeq
      assert(served == live)
      // ---- crash window 1: staging complete, manifest NOT yet written
      //      (simulated: a leftover staging dir) -> roll BACK, table intact
      val cat = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("bm25_m_t"))
      val loc = new org.apache.hadoop.fs.Path(cat.location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stagingDir = new org.apache.hadoop.fs.Path(loc.toString + ".merge_tmp")
      fs.mkdirs(stagingDir)
      Retrieval.recoverBm25StatsTable(spark, "bm25_m_t")
      assert(!fs.exists(stagingDir), "manifest-less staging must roll back")
      assert(tableRows("bm25_m_t") == refRows)
      // ---- crash windows 2-4: manifest written (commit point), apply
      //      stops (a) before any rename, (b) after a partial rename,
      //      (c) after renames but before deletes/props. Stage a second
      //      batch merge and manufacture each state; every recover must
      //      land on the SAME final table.
      val batch2 = Seq((10L, "spark stream spark window"),
        (11L, "entirely novel terms only")).toDF("doc_id", "text")
      Retrieval.writeBm25StatsTable(docs.unionByName(batch2),
        col("doc_id"), col("text"), "bm25_m_ref2", buckets = 2,
        path = Some(s"$dirRoot/ref2"))
      val ref2Rows = tableRows("bm25_m_ref2")
      val ref2Props = tableProps("bm25_m_ref2")
      def checkWindow(tag: String)(corrupt: () => Unit): Unit = {
        assert(Retrieval.stageBm25Merge(batch2, col("text"), "bm25_m_t", tag),
          s"window $tag staged nothing")
        corrupt()
        Retrieval.recoverBm25StatsTable(spark, "bm25_m_t")
        assert(tableRows("bm25_m_t") == ref2Rows, s"window $tag rows diverged")
        assert(tableProps("bm25_m_t") == ref2Props, s"window $tag props diverged")
        // rewind the table to the pre-merge state for the next window
        spark.sql("DROP TABLE IF EXISTS bm25_m_t")
        fs.delete(loc, true)
        Retrieval.writeBm25StatsTable(corpus, col("doc_id"), col("text"),
          "bm25_m_t", buckets = 2, path = Some(s"$dirRoot/t"))
        Retrieval.mergeBm25StatsTable(batch, col("text"), "bm25_m_t", "b1")
      }
      checkWindow("w_none")(() => ()) // crash right after the manifest
      checkWindow("w_partial") { () =>
        // one staged file renamed in, the rest not, nothing deleted
        val staged = fs.listStatus(stagingDir)
          .filter(f => f.getPath.getName.startsWith("part-")).map(_.getPath)
        assert(staged.nonEmpty)
        assert(fs.rename(staged.head,
          new org.apache.hadoop.fs.Path(loc, staged.head.getName)))
      }
      checkWindow("w_renamed") { () =>
        // all staged files renamed in (old files still beside them):
        // the duplicate-row window the serve's max(df) fold reads through
        val staged = fs.listStatus(stagingDir)
          .filter(f => f.getPath.getName.startsWith("part-")).map(_.getPath)
        staged.foreach(p => assert(fs.rename(p,
          new org.apache.hadoop.fs.Path(loc, p.getName))))
        // mid-window serve: duplicates fold by max -> merged values win
        val catNow = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier("bm25_m_t"))
        val direct = Retrieval.readStatsDfMap(spark, catNow, Seq("spark"))
        assert(direct("spark") == ref2Rows("spark"),
          s"mid-window serve read ${direct("spark")}, want merged ${ref2Rows("spark")}")
      }
      // a stale-corpus serve with expectedN refuses loudly
      val e = intercept[IllegalArgumentException] {
        Retrieval.bm25TopKFromStats(docs, col("doc_id"), col("text"),
          "bm25_m_t", Seq("spark"), k = 5, expectedN = Some(99L))
      }
      assert(e.getMessage.contains("stale BM25 stats table"), e.getMessage)
    } finally {
      Seq("bm25_m_t", "bm25_m_ref", "bm25_m_ref2").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
