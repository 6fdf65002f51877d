package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for the bench serial tail (not part of the
  * driver contract; run by hand, see PERF.md).
  */
object Probe {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach { tb =>
      try Tables.load(spark, d, tb).limit(1).collect() catch { case _: Throwable => } }

    if (sys.env.contains("SPARK_GRAFT_PROBE_EXEC")) {
      // generic executed-plan probe (r18): run the named queries twice and
      // report wall, stage/task counts, and the FINAL adaptive plan's
      // operator tallies — the initial explain shows duplicated subtrees
      // (e.g. PrefixSum references its input 6x) and only the executed
      // plan says whether runtime exchange reuse collapsed them
      val names = sys.env("SPARK_GRAFT_PROBE_EXEC").split(',').toSeq
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val cpuMs = new java.util.concurrent.atomic.AtomicLong(0L)
      val trueCpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
      // per-job wall attribution (jobId -> (startNs, descr)); printed for
      // multi-job queries (streaming replays, fit-then-serve) where the
      // stage tally alone can't say which driver-sequenced job owns the wall
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
      val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      val jobCpu = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(sc.stageInfo.numTasks)
            // executor CPU attribution: under the N-stream bench wall the
            // binding resource is total executor time, not per-query wall
            cpuMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
            trueCpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
            val jid = stageJob.get(sc.stageInfo.stageId)
            jobCpu.merge(jid, sc.stageInfo.taskMetrics.executorRunTime,
              (a, b) => a + b)
            ()
          }
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val d = Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            jobStart.put(j.jobId, (System.nanoTime(), d))
            j.stageIds.foreach(s => stageJob.put(s, j.jobId))
            ()
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = jobStart.remove(j.jobId)
            if (s != null)
              jobs.add(((System.nanoTime() - s._1) / 1e9,
                f"job ${j.jobId} cpu=${jobCpu.getOrDefault(j.jobId, 0L) / 1000.0}%.2fs ${s._2.take(50)}"))
            ()
          }
        })
      val runsN = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
      for (name <- names; r <- 1 to runsN) {
        stages.set(0); tasks.set(0); jobs.clear(); cpuMs.set(0L)
        trueCpuNs.set(0L)
        val df = t(s"$name r$r") {
          val df = SparkEntry.queries(name)(spark, d)
          df.count(); df
        }
        // collect() executes THIS df's own QueryExecution, so the adaptive
        // plan below is finalized (count() plans a separate agg on top and
        // leaves df's plan isFinalPlan=false, hiding runtime reuse).
        // Skippable for pure timing/CPU sweeps (PROBE_PLAN=0): the collect
        // doubles the execution and pollutes the CPU tally.
        val wantPlan = !sys.env.get("SPARK_GRAFT_PROBE_PLAN").contains("0")
        if (wantPlan) df.collect()
        Thread.sleep(300)
        val p = if (wantPlan) df.queryExecution.executedPlan.toString else ""
        def c(pat: String) = pat.r.findAllIn(p).size
        println(f"[probe]   $name r$r occ=${cpuMs.get / 1000.0}%.2fs" +
          f" cpu=${trueCpuNs.get / 1e9}%.2fs" +
          s" stages=${stages.get} tasks=${tasks.get}" +
          s" scans=${c("Scan parquet")} exch=${c("Exchange")}" +
          s" reusedExch=${c("ReusedExchange")} bhj=${c("BroadcastHashJoin")}" +
          s" smj=${c("SortMergeJoin")} aqe=${c("AdaptiveSparkPlan")}" +
          s" shufStage=${c("ShuffleQueryStage")}" +
          s" reusedStage=${c("ReusedQueryStage|ReusedSubquery")}")
        if (wantPlan) java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/probe_exec_${name}_r$r.txt"), p)
        if (sys.env.get("SPARK_GRAFT_PROBE_JOBS").contains("1")) {
          import scala.jdk.CollectionConverters._
          val js = jobs.asScala.toSeq
          println(f"[probe]   $name r$r njobs=${js.size} jobwall=${js.map(_._1).sum}%.3f")
          js.sortBy(-_._1).take(12).foreach { case (w, id) =>
            println(f"[probe]     $w%6.3f  $id") }
        }
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_BM25").contains("1")) {
      // phase-time the q71 serve vs the q5x live fit over the 100x copies
      // (run Scale10x with SPARK_GRAFT_REUSE=1 first to materialize them)
      val p = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS",
        "/tmp/graft_scale10x/docs100")
      val table = "graft_probe_bm25"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      t("stats table build") {
        graft.operators.Retrieval.writeBm25StatsTable(
          spark.read.parquet(p), col("doc_id"), col("text"), table,
          buckets = 32, path = Some("/tmp/graft_probe_bm25"))
      }
      val cat = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      val terms = graft.queries.TextQueries.Bm25Terms
      for (r <- 1 to 3) {
        t(s"dfMap driver-direct r$r") {
          graft.operators.Retrieval.readStatsDfMap(spark, cat, terms)
        }
        t(s"kernel scan only r$r") {
          spark.read.parquet(p).select(col("doc_id"),
              graft.expressions.Bm25TermStats(col("text"), terms.toArray)
                .as("__s"))
            .select(sum(col("__s.dl"))).collect()
        }
        t(s"serve full r$r") {
          graft.queries.TextQueries.bm25Served(
            spark.read.parquet(p), table).collect()
        }
        t(s"live topk full r$r") {
          graft.queries.TextQueries.bm25(spark.read.parquet(p)).collect()
        }
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_SALIENT").contains("1")) {
      val out = graft.operators.Curate.salientTerms(
        Tables.documents(spark, d), "doc_id", "text", k = 3)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(sc.stageInfo.numTasks)
          }
        })
      for (aqe <- Seq("true", "false"); r <- 1 to 2) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        stages.set(0); tasks.set(0)
        t(s"salient aqe=$aqe r$r") {
          graft.operators.Curate.salientTerms(
            Tables.documents(spark, d), "doc_id", "text", k = 3).count()
        }
        Thread.sleep(500)
        println(s"[probe] aqe=$aqe r$r stages=${stages.get} tasks=${tasks.get}")
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_Q35").contains("1")) {
      import graft.sources.Sources
      def li = Tables.lineitem(spark, d)
        .select(col("l_suppkey"), col("l_partkey"), col("l_linenumber"))
      def paths = graft.operators.Par.spread(li)
        .select(format_string("/tiles/s%d/s%d_%d_%d.jpg",
          col("l_suppkey"), col("l_suppkey"),
          col("l_partkey") % 100, col("l_linenumber")).as("path"))
      val meta = Tables.supplier(spark, d).select(
        format_string("s%d", col("s_suppkey")).as("slide_name"), col("s_nationkey"))
      for (r <- 1 to 2) {
        t(s"scan+spread r$r") { graft.operators.Par.spread(li).count() }
        t(s"+format r$r") { paths.agg(count(col("path"))).collect() }
        t(s"+parse r$r") { paths
          .select((col("path") +: Sources.parseTilePath(col("path"))): _*)
          .agg(count(col("slide_name")), sum(col("col")), sum(col("row"))).collect() }
        t(s"no-spread parse r$r") { li
          .select(format_string("/tiles/s%d/s%d_%d_%d.jpg",
            col("l_suppkey"), col("l_suppkey"),
            col("l_partkey") % 100, col("l_linenumber")).as("path"))
          .select((col("path") +: Sources.parseTilePath(col("path"))): _*)
          .agg(count(col("slide_name")), sum(col("col")), sum(col("row"))).collect() }
        t(s"q35 full r$r") { SparkEntry.queries("q35_tile_paths")(spark, d).count() }
        // candidate kernel: same outputs, no regex, no array allocation —
        // suffix strip via endswith+substr, fields via substring_index
        t(s"parse v2 (substr) r$r") {
          val file = substring_index(col("path"), "/", -1)
          val base = when(endswith(file, lit(".jpg")),
            file.substr(lit(1), length(file) - 4)).otherwise(file)
          paths.select(
              substring_index(substring_index(col("path"), "/", -2), "/", 1)
                .as("slide_name"),
              substring_index(substring_index(base, "_", -2), "_", 1)
                .cast("int").as("col"),
              substring_index(base, "_", -1).cast("int").as("row"))
            .agg(count(col("slide_name")), sum(col("col")), sum(col("row")))
            .collect()
        }
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_Q36").contains("1")) {
      // phase-attribute the H6 DAG: is the 0.5s r7->r9 rise in the scoring
      // join, the metric tail, or a re-planned upstream? Also counts
      // lineitem scans in the executed plan (the round-5 double-planning
      // failure mode).
      import org.apache.spark.sql.DataFrame
      val cust = Tables.customer(spark, d)
      def mk(df: DataFrame) = df.select(
        col("c_custkey").cast("string").as("slide_name"),
        (col("c_custkey") % 2).cast("int").as("label"),
        when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal")).as("age"),
        when(col("c_custkey") % 5 === 0, lit(null))
          .otherwise((col("c_nationkey") % 2).cast("int")).as("gender"))
      val cfg = graft.pipeline.Experiment.Config(
        catCols = Seq("gender"), rollupThreshold = 50.0)
      import graft.pipeline.TileScorer.tileEnc
      def tiles = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("string").as("slide_name"),
          col("l_linenumber").cast("int").as("tile_col"),
          lit(0).as("tile_row"),
          to_binary(lpad(hex(col("l_partkey")), 16, "0"), lit("hex")).as("payload"))
        .as[graft.pipeline.Tile](tileEnc)
      for (r <- 1 to 2) {
        t(s"join only r$r") { Tables.lineitem(spark, d)
          .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"), col("l_partkey")).count() }
        t(s"tiles+score r$r") { graft.pipeline.TileScorer.score(
          tiles, graft.pipeline.TileScorer.PayloadModScorer(100)).count() }
        t(s"prepared r$r") { graft.pipeline.Experiment.prepare(
          graft.pipeline.Experiment.ingest(Seq(
            mk(cust.where(col("c_nationkey") < 12)),
            mk(cust.where(col("c_nationkey") >= 12)))), cfg).count() }
        val full = t(s"q36 full r$r") {
          val df = SparkEntry.queries("q36_pipeline_e2e")(spark, d)
          df.count(); df
        }
        val p = full.queryExecution.executedPlan.toString
        println(s"[probe]   lineitem scans in executed plan: " +
          "lineitem".r.findAllIn(p).size)
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_ASOF").contains("1")) {
      // phase-time the union-trick asof join on the 10x events copy (run
      // Scale10x first with SPARK_GRAFT_REUSE=1 so /tmp/graft_scale10x/ev10
      // exists); isolates exchange+sort vs window vs payload-projection cost
      val p = "/tmp/graft_scale10x/ev10"
      val e = spark.read.parquet(p)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("tus"), col("event_id"), col("value"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("tus"), col("value").as("view_value"))
      def cnt(df: org.apache.spark.sql.DataFrame): Long = df.agg(count(lit(1)),
        sum(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L))))
        .collect()(0).getLong(0)
      for (r <- 1 to 2) {
        t(s"asof full r$r") { cnt(graft.operators.Events.asofJoin(
          clicks, views, "user_id", "tus", Seq("tus", "view_value"))) }
        t(s"scan both sides r$r") { cnt(clicks.unionByName(
          views.select(col("user_id"), col("tus"),
            lit(null).cast("long").as("event_id"), col("view_value").as("value")))) }
        t(s"exchange+sort only r$r") {
          import org.apache.spark.sql.expressions.Window
          val u = clicks.unionByName(views.select(col("user_id"), col("tus"),
            lit(null).cast("long").as("event_id"), col("view_value").as("value")))
          cnt(u.withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("tus")))))
        }
        t(s"window last scalar r$r") {
          import org.apache.spark.sql.expressions.Window
          val u = clicks.withColumn("vv", lit(null).cast("double"))
            .withColumn("side", lit(1))
            .unionByName(views.select(col("user_id"), col("tus"),
              lit(null).cast("long").as("event_id"),
              lit(null).cast("double").as("value"), col("view_value").as("vv"),
              lit(0).as("side")))
          val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("side"))
            .rowsBetween(Window.unboundedPreceding, 0)
          cnt(u.withColumn("lv", last(col("vv"), ignoreNulls = true).over(w))
            .filter(col("side") === 1))
        }
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_AGG").contains("1")) {
      val p = "/tmp/graft_scale10x/li100"
      def force(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(count(lit(1)), sum(pmod(xxhash64(df.columns.map(col): _*),
          lit(1000000007L)))).collect()(0).getLong(0)
      spark.read.parquet(p).count()
      (1 to 3).foreach { r =>
        t(s"agg baseline strings r$r") {
          force(spark.read.parquet(p)
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum(col("l_quantity")).as("sq"), sum(col("l_extendedprice")).as("sp"),
              avg(col("l_discount")).as("ad"), count(lit(1)).as("n")))
        }
        t(s"agg hashed+decode   r$r") {
          val base = spark.read.parquet(p)
          val agg = base
            .groupBy(xxhash64(col("l_returnflag"), col("l_linestatus")).as("__k"))
            .agg(sum(col("l_quantity")).as("sq"), sum(col("l_extendedprice")).as("sp"),
              avg(col("l_discount")).as("ad"), count(lit(1)).as("n"))
          val decode = base
            .groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)).as("__d"))
            .select(xxhash64(col("l_returnflag"), col("l_linestatus")).as("__k"),
              col("l_returnflag"), col("l_linestatus"))
          force(agg.join(broadcast(decode), Seq("__k"))
            .select(col("l_returnflag"), col("l_linestatus"),
              col("sq"), col("sp"), col("ad"), col("n")))
        }
        t(s"agg long-key only   r$r") {
          force(spark.read.parquet(p)
            .groupBy(xxhash64(col("l_returnflag"), col("l_linestatus")).as("__k"))
            .agg(sum(col("l_quantity")).as("sq"), sum(col("l_extendedprice")).as("sp"),
              avg(col("l_discount")).as("ad"), count(lit(1)).as("n")))
        }
        t(s"agg sums only       r$r") {
          force(spark.read.parquet(p)
            .agg(sum(col("l_quantity")).as("sq"), sum(col("l_extendedprice")).as("sp"),
              avg(col("l_discount")).as("ad"), count(lit(1)).as("n")))
        }
      }
      spark.stop(); return
    }

    // grouped_topk 100x decomposition (round-10 verdict item 3): how much
    // of the probe's wall is the scan floor vs the operator itself, and
    // does the bounded-heap op still beat the window formulation at scale.
    if (sys.env.get("SPARK_GRAFT_PROBE_TOPK").contains("1")) {
      val p = "/tmp/graft_scale10x/ord100"
      def force(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(count(lit(1)), sum(pmod(xxhash64(df.columns.map(col): _*),
          lit(1000000007L)))).collect()(0).getLong(0)
      spark.read.parquet(p).count()
      (1 to 3).foreach { r =>
        t(s"topk scan-3col floor r$r") {
          force(spark.read.parquet(p)
            .select("o_custkey", "o_orderkey", "o_totalprice"))
        }
        t(s"topk heap operator   r$r") {
          force(graft.plans.GroupedTopK.perGroup(
            spark.read.parquet(p).select("o_custkey", "o_orderkey", "o_totalprice"),
            Seq(col("o_custkey")),
            struct(col("o_totalprice"), col("o_orderkey")), k = 3))
        }
        t(s"topk window form     r$r") {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice"), col("o_orderkey"))
          force(spark.read.parquet(p)
            .select("o_custkey", "o_orderkey", "o_totalprice")
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") <= 3).drop("__rn"))
        }
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_SUBSTR").contains("1")) {
      // phase-time the q6f span report over the 100x copies (run Scale10x
      // with SPARK_GRAFT_REUSE=1 first)
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val p = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS",
        "/tmp/graft_scale10x/docs100")
      import graft.expressions.WordShingles
      val k = 8
      for (r <- 1 to 2) {
        val docs = spark.read.parquet(p)
        t(s"scan only r$r") { docs.agg(count(lit(1))).collect() }
        t(s"windows explode+hash r$r") {
          docs.select(col("doc_id"),
              posexplode(WordShingles.ngrams(col("text"), k))
                .as(Seq("__pos", "__g")))
            .select(col("doc_id"), col("__pos").cast("long").as("__pos"),
              xxhash64(col("__g")).as("__fp"))
            .agg(count(lit(1)),
              sum(pmod(col("__fp"), lit(1000000007L)))).collect()
        }
        t(s"hot fps (shingle kernel) r$r") {
          docs.select(explode(WordShingles.shingles(col("text"), k)).as("__g"))
            .select(xxhash64(col("__g")).as("__fp"))
            .groupBy(col("__fp")).agg(count(lit(1)).as("__nd"))
            .filter(col("__nd") >= 2)
            .agg(count(lit(1))).collect()
        }
        t(s"full report r$r") {
          val df = graft.operators.Dedup.duplicatedSpans(
            docs, "doc_id", "text", k = k, minDocs = 2)
          df.agg(count(lit(1)),
            sum(pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
              lit(1000000007L)))).collect()
        }
        t(s"full removal r$r") {
          val df = graft.operators.Dedup.removeDuplicatedSpans(
            docs, "doc_id", "text", k = k, minDocs = 2)
          df.agg(count(lit(1)),
            sum(pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
              lit(1000000007L)))).collect()
        }
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_LM3").contains("1")) {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val p = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS",
        "/tmp/graft_scale10x/docs100")
      import graft.expressions.WordShingles
      for (r <- 1 to 2) {
        val docs = spark.read.parquet(p)
        t(s"kernel+explode count r$r") {
          docs.select(explode(
              WordShingles.multiGramCounts(col("text"), 2, 3)).as("__g"))
            .agg(count(lit(1))).collect()
        }
        t(s"explode+agg r$r") {
          docs.select(explode(
              WordShingles.multiGramCounts(col("text"), 2, 3)).as("__g"))
            .groupBy(col("__g.n").as("n"), col("__g.gram").as("g"))
            .agg(sum(col("__g.cnt")).as("c"))
            .agg(count(lit(1))).collect()
        }
        t(s"full trigram fit r$r") {
          graft.ml.NgramLm.fitOrder(docs, col("text"), 3, 400, 800)
        }
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_SM").contains("1")) {
      // job-level attribution for the q6c/q6p 2-trigger replays
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(j.jobId, (System.nanoTime(),
              Option(j.properties.getProperty("spark.job.description"))
                .getOrElse("?").take(70)))
            ()
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(j.jobId)
            if (s != null) jobs.add(
              f"job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%6.3f s  ${s._2}")
            ()
          }
        })
      for (q <- Seq("q6c_stream_selfmaintain", "q6p_stream_semgate_sm");
           aqe <- Seq("true", "false"); r <- 1 to 2) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        jobs.clear()
        t(s"$q aqe=$aqe r$r") { SparkEntry.queries(q)(spark, d).count() }
        Thread.sleep(300)
        if (r == 2) println(s"[probe]   jobs=${jobs.size}")
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_PROBE_STREAM").contains("1")) {
      // per-micro-batch durationMs breakdown for the three streaming
      // replays: separates the streaming ENGINE's trigger overhead
      // (offset/commit logs, planning) from addBatch (the foreachBatch
      // body = the actual gate work)
      val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            progress.add(s"batch=${e.progress.batchId} rows=${e.progress.numInputRows} durationMs=${e.progress.durationMs}")
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        })
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(sc.stageInfo.numTasks)
            ()
          }
        })
      for (q <- Seq("q6a_stream_sessions_s10", "q6b_stream_neardup",
                    "q6c_stream_selfmaintain");
           aqe <- Seq("true", "false"); r <- 1 to 2) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        progress.clear(); stages.set(0); tasks.set(0)
        t(s"$q aqe=$aqe r$r") { SparkEntry.queries(q)(spark, d).count() }
        Thread.sleep(500)
        println(s"[probe]   stages=${stages.get} tasks=${tasks.get}")
        progress.forEach(p => println(s"[probe]   $p"))
      }
      spark.stop(); return
    }

    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      // ---- q6a phases ----
      t("q6a full") { SparkEntry.queries("q6a_stream_sessions_s10")(spark, d).count() }
      val events = Tables.events(spark, d)
      val rows = t("q6a collect") {
        events.select(col("user_id").cast("long").as("user_id"), col("ts"),
          col("value").cast("double").as("value")).collect()
      }
      println(s"[probe] q6a events rows=${rows.length}")

      // ---- q6b phases ----
      t("q6b full") { SparkEntry.queries("q6b_stream_neardup")(spark, d).count() }
      t("q4w batch gate (same probe)") { SparkEntry.queries("q4w_neardup_against")(spark, d).count() }
      t("q5f table probe") { SparkEntry.queries("q5f_bandtable_probe")(spark, d).count() }

      // ---- q4f / q4j ----
      t("q4f full") { SparkEntry.queries("q4f_drop_neardupes")(spark, d).count() }
      t("q4j full") { SparkEntry.queries("q4j_cluster_exact")(spark, d).count() }

      // ---- q36 ----
      t("q36 full") { SparkEntry.queries("q36_pipeline_e2e")(spark, d).count() }
      t("q6c full") { SparkEntry.queries("q6c_stream_selfmaintain")(spark, d).count() }
    }
    spark.stop()
  }
}
