package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "alpha beta alpha beta"),
    (2L, "alpha beta gamma")
  ).toDF("doc_id", "text")

  private def raw = Seq(
    (10L, "delta epsilon delta"),
    (11L, "delta epsilon zeta"),
    (12L, "alpha beta alpha"),   // target-like raw doc
    (13L, "alpha beta alpha")    // identical twin -> tie on logw
  ).toDF("doc_id", "text")

  test("fit: deterministic, bounded delta table, empty-corpus guard") {
    val a = Dsir.fit(target, raw, "text", buckets = 64)
    val b = Dsir.fit(target, raw, "text", buckets = 64)
    assert(a == b, "refit must be bit-identical")
    assert(a.deltaMicro.size == 64)
    intercept[IllegalArgumentException] {
      Dsir.fit(target, raw, "text", buckets = 1)
    }
  }

  test("scores: the projection fold equals an explode+join recomputation") {
    val m = Dsir.fit(target, raw, "text", buckets = 32)
    val fast = Dsir.scores(raw, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent formulation: explode features, look the delta up per
    // row, aggregate — must equal the zero-shuffle element_at fold
    val dl = m.deltaMicro.zipWithIndex.map { case (v, b) => (b.toLong, v) }
      .toDF("b", "delta")
    val slow = raw
      .select(col("doc_id"), explode(Dsir.featureCol(col("text"))).as("f"))
      .select(col("doc_id"), Dsir.bucketCol(col("f"), m.buckets).as("b"))
      .join(dl, Seq("b"))
      .groupBy("doc_id").agg(sum("delta").as("logw_micro"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.toSeq == slow.toSeq)
  }

  test("target-like documents outscore raw-like ones; selection ties break on id") {
    val m = Dsir.fit(target, raw, "text", buckets = 64)
    val s = Dsir.scores(raw, "doc_id", "text", m).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s(12L) > s(10L), s"target-like ${s(12L)} !> raw-like ${s(10L)}")
    assert(s(12L) == s(13L), "identical texts must score identically")
    val top = Dsir.select(raw, "doc_id", "text", m, k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(12L, 13L), s"tie must break on ascending id: $top")
    intercept[IllegalArgumentException] {
      Dsir.select(raw, "doc_id", "text", m, k = 0)
    }
  }

  test("selectGumbel: seeded-deterministic, seed-sensitive, noise is the spelled chain") {
    val m = Dsir.fit(target, raw, "text", buckets = 64)
    val a = Dsir.selectGumbel(raw, "doc_id", "text", m, k = 3, seed = 17L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Dsir.selectGumbel(raw, "doc_id", "text", m, k = 3, seed = 17L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "same seed must reproduce the same sample bit-for-bit")
    // the noisy keys equal logw + the hand-computed Gumbel term: the
    // noise chain is a pure function of (id, seed), no engine RNG
    val logw = Dsir.scores(raw, "doc_id", "text", m).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def gumbelMicro(id: Long, seed: Long): Long = {
      val r = math.floorMod(math.floorMod(id + seed, 1000000007L)
        * 2654435761L, 1000000007L)
      val u = (r + 1).toDouble / 1000000008.0
      BigDecimal(1e6 * -math.log(-math.log(u)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    a.foreach { case (id, key) =>
      assert(key == logw(id) + gumbelMicro(id, 17L),
        s"doc $id: key $key != ${logw(id)} + ${gumbelMicro(id, 17L)}")
    }
    // a different seed permutes the noise — on the tied twin pair (12/13
    // share logw) SOME seed must order them differently than seed 17
    val order17 = a.map(_._1)
    val flipped = (1L to 50L).exists { s =>
      Dsir.selectGumbel(raw, "doc_id", "text", m, k = 3, seed = s)
        .collect().map(_.getLong(0)).toSeq != order17
    }
    assert(flipped, "50 seeds all produced the identical sample — noise inert?")
  }

  test("driftStats: rows equal an independent recomputation, target batch reads above raw baseline, sidecar-bound, refusals") {
    val m = Dsir.fit(target, raw, "text", buckets = 64)
    val dir = java.nio.file.Files.createTempDirectory("dsir_drift").toString
    Dsir.save(spark, m, s"$dir/m")
    // a model without the sidecar refuses with a clear message
    val e = intercept[IllegalArgumentException] {
      Dsir.driftStats(spark, s"$dir/m", target, "text")
    }
    assert(e.getMessage.contains("predates drift stats"), e.getMessage)
    Dsir.writeDriftSidecar(spark, s"$dir/m", raw, "text")
    val out = Dsir.driftStats(spark, s"$dir/m", target, "text")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent recomputation of both sums via the composed fold
    def sumOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(Dsir.logwMicroColComposed(col("text"), m).as("w"))
        .collect().map(_.getLong(0)).sum
    assert(out.toSeq == Seq(
      ("batch", 2L, sumOf(target)), ("build", 4L, sumOf(raw))))
    // the refit-signal direction: the TARGET batch's mean importance
    // must sit above the raw fit corpus's baseline mean
    assert(out(0)._3 / out(0)._2 > out(1)._3 / out(1)._2,
      "target-like batch must read above the raw baseline")
    // the build row comes from the SIDECAR: a doctored stat surfaces
    // verbatim (the q72 oracle's recompute would break the hash)
    val p = new org.apache.hadoop.fs.Path(s"$dir/m/_drift.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    try o.write("""{"fmt": 1, "statN": 4, "statSumMicro": -99}""".getBytes)
    finally o.close()
    val doctored = Dsir.driftStats(spark, s"$dir/m", target, "text")
      .where(col("src") === "build").collect().head.getLong(2)
    assert(doctored == -99L, s"build row must come from the sidecar: $doctored")
    // the sidecar is invisible to the model loader (underscore file)
    assert(Dsir.load(spark, s"$dir/m") == m)
  }

  test("DsirScore kernel == the composed element_at fold, bit-for-bit") {
    val m = Dsir.fit(target, raw, "text", buckets = 256)
    // edge cases the tokenizer's collapse rules produce: empty text and
    // whitespace-only both yield ONE empty token (split(trim(s)) = [""]),
    // single token has no bigrams, runs of whitespace collapse, unicode
    // bytes hash as written, null stays null
    val edges = Seq(
      (1L, Some("")), (2L, Some("   ")), (3L, Some("one")),
      (4L, Some("a  b\t c\nd")), (5L, Some("é ü 東京 a-b")),
      (6L, Some((0 until 400).map(i => s"tok$i").mkString(" "))),
      (7L, None: Option[String])
    ).toDF("doc_id", "text")
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edges, real)) {
      val mismatch = df.select(
          Dsir.logwMicroCol(col("text"), m).as("fused"),
          Dsir.logwMicroColComposed(col("text"), m).as("composed"))
        .filter(not(col("fused") <=> col("composed"))).count()
      assert(mismatch == 0L, s"$mismatch rows diverge from the composed fold")
    }
  }

  test("Md5Bucket kernel == the composed pmod/conv/substring/md5 chain") {
    // the fused kernel must stay bit-identical to the q57 idiom the
    // oracle replays — over varied tokens and bucket counts
    val words = (0 until 500).map(i => s"w$i token-$i é$i").mkString(" ")
    val df = Seq((1L, words)).toDF("doc_id", "text")
      .select(explode(Dsir.featureCol(col("text"))).as("f"))
    for (k <- Seq(2, 64, 256, 65536)) {
      val mismatch = df.select(
          graft.expressions.Md5Bucket(col("f"), k).as("fused"),
          pmod(conv(substring(md5(col("f")), 1, 15), 16, 10).cast("long"),
            lit(k.toLong)).as("composed"))
        .filter(col("fused") =!= col("composed")).count()
      assert(mismatch == 0L, s"k=$k: $mismatch mismatching buckets")
    }
  }

  test("save/load: bit-identical round trip; torn artifact refused") {
    val m = Dsir.fit(target, raw, "text", buckets = 64)
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    Dsir.save(spark, m, s"$dir/ok")
    val loaded = Dsir.load(spark, s"$dir/ok")
    assert(loaded == m, "round trip must be bit-identical")
    // torn artifact: deltas from a DIFFERENT bucket count than the meta
    Dsir.save(spark, Dsir.fit(target, raw, "text", buckets = 32), s"$dir/torn")
    val p = new org.apache.hadoop.fs.Path(s"$dir/torn/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("""{"fmt": 1, "buckets": 64}""".getBytes)
    finally out.close()
    intercept[IllegalArgumentException] { Dsir.load(spark, s"$dir/torn") }
  }

  test("refitAndSwap: served == refit model, drift baseline restarts, mid-swap loud, recovery") {
    val m0 = Dsir.fit(target, raw, "text", buckets = 64)
    // the refit: target/raw roles swapped — genuinely different deltas
    val m1 = Dsir.fit(raw, target, "text", buckets = 64)
    assert(m0 != m1, "refit fixture needs a genuinely different model")
    val dir = java.nio.file.Files.createTempDirectory("dsir_swap").toString
    val path = s"$dir/dsir"
    Dsir.save(spark, m0, path)
    Dsir.writeDriftSidecar(spark, path, raw, "text")
    Dsir.refitAndSwap(spark, m1, target, "text", path)
    assert(Dsir.load(spark, path) == m1, "the refit model must be serving")
    // the drift clock restarted at the refit corpus: baseline == a fresh
    // save + sidecar of m1 over the same corpus
    Dsir.save(spark, m1, s"$dir/fresh")
    Dsir.writeDriftSidecar(spark, s"$dir/fresh", target, "text")
    def buildRow(p: String) = Dsir.driftStats(spark, p, raw, "text")
      .where(col("src") === "build").collect()
      .map(r => (r.getLong(1), r.getLong(2))).head
    assert(buildRow(path) == buildRow(s"$dir/fresh"),
      "swapped drift baseline != fresh baseline")
    // mid-swap window: live path absent between the renames — loud fail,
    // swapped-out dir consistent; a re-run recovers (ArtifactSwap's
    // window coverage is pinned exhaustively in TextClassifierSpec)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$path.swap_old")
    assert(fs.rename(root, old))
    intercept[Exception] { Dsir.load(spark, path) }
    assert(Dsir.load(spark, old.toString) == m1,
      "the swapped-out artifact must stay internally consistent")
    Dsir.refitAndSwap(spark, m1, target, "text", path)
    assert(Dsir.load(spark, path) == m1, "roll-back recovery diverged")
    val stray = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("dsir.")).toSeq
    assert(stray.isEmpty, s"recovery left stray swap dirs: $stray")
  }

  test("scores plan: zero-shuffle pure projection") {
    val m = Dsir.fit(target, raw, "text", buckets = 32)
    val plan = Dsir.scores(raw, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
