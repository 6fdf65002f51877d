package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two toy "languages" with disjoint vocabularies — linearly separable
  // from hashed token counts
  private def corpus = {
    val en = Seq("the cat sat on the mat", "a dog ran over the hill",
      "the bird flew above the trees", "cats and dogs play in the garden",
      "the sun rises over the quiet town")
    val xx = Seq("zorp blick frum glorp nix", "blick nix zorp frum wex",
      "glorp wex nix blick zorp", "frum zorp wex glorp blick",
      "nix frum blick wex glorp")
    (en.zipWithIndex.map { case (t, i) => (i.toLong, t, 1.0) } ++
      xx.zipWithIndex.map { case (t, i) => (100L + i, t, 0.0) })
      .toDF("doc_id", "text", "y")
  }

  test("hashedFeatures: counts sum to token count, buckets engine-portable") {
    val k = 16
    val f = TextClassifier.hashedFeatures(corpus, "text", k)
    val sums = f.select(
      (0 until k).map(j => col(s"f$j")).reduce(_ + _).as("total"),
      size(split(col("text"), " ")).cast("double").as("n"))
    assert(sums.filter(col("total") =!= col("n")).count() == 0,
      "bucket counts must partition the token stream")
    // hand-check one token against the portable formula
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("the".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = (java.lang.Long.parseLong(h.take(15), 16) % k).toInt
    val row = TextClassifier.hashedFeatures(
        Seq((1L, "the")).toDF("doc_id", "text"), "text", k)
      .select(col(s"f$bucket")).as[Double].head()
    assert(row == 1.0, s"token 'the' must land in md5 bucket $bucket")
  }

  test("fused bucket-counts kernel == composed size(filter) chain, bit-equal") {
    val k = 16
    // edge cases the kernel must share with the composed form: empty
    // string and whitespace-only text (both tokenize to one empty token),
    // repeated tokens, multi-space runs
    val edge = Seq((200L, ""), (201L, "   "), (202L, "the the the"),
      (203L, "a  b   c"), (204L, "solo")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit(0.0).as("y"))
    val docs = corpus.unionByName(edge)
    val fused = TextClassifier.hashedFeatures(docs, "text", k)
      .select((col("doc_id") +: (0 until k).map(j => col(s"f$j"))): _*)
      .collect().map(_.toString).sorted.toSeq
    val composed = TextClassifier.hashedFeaturesComposed(docs, "text", k)
      .select((col("doc_id") +: (0 until k).map(j => col(s"f$j"))): _*)
      .collect().map(_.toString).sorted.toSeq
    assert(fused == composed,
      "Md5BucketCounts must be bit-identical to the composed chain")
  }

  test("fit separates disjoint vocabularies; margin chain matches driver fold") {
    val k = 32
    val m = TextClassifier.fit(corpus, "text", "y", k = k)
    val scored = TextClassifier.score(m, corpus, "text", k)
    val acc = scored.filter(col("pred") === col("y").cast("int")).count()
    assert(acc == 10, s"disjoint vocabularies must separate, got $acc/10")
    // the Column margin equals the same left-associative fold on the driver
    val c = m.coefficients.toArray
    scored.select((col("margin") +: (0 until k).map(j => col(s"f$j"))): _*)
      .collect().foreach { r =>
        var ref = m.intercept
        (0 until k).foreach(j => ref += c(j) * r.getDouble(1 + j))
        assert(ref == r.getDouble(0), "margin chain must be bit-identical")
      }
  }

  test("refit in the same session is bit-identical (dynamic-oracle precondition)") {
    val a = TextClassifier.fit(corpus, "text", "y", k = 32)
    val b = TextClassifier.fit(corpus, "text", "y", k = 32)
    assert(a.intercept == b.intercept &&
      a.coefficients.toArray.sameElements(b.coefficients.toArray),
      "coalesce(1) fit must make refits deterministic")
  }

  test("marginSql forces DOUBLE-parsing literals (no bare 17-digit decimals)") {
    val m = TextClassifier.fit(corpus, "text", "y", k = 8)
    val sql = TextClassifier.marginSql(m)
    // every numeric literal must carry an exponent so DuckDB parses it as
    // DOUBLE, not DECIMAL (decimal->double conversion double-rounds)
    val bare = "(?<![\\w.eE+-])\\d+\\.\\d{2,}(?![\\deE])".r.findFirstIn(sql)
    assert(bare.isEmpty, s"bare decimal literal would parse as DECIMAL: $bare")
  }

  test("scoring plan evaluates the counting kernel exactly once per row") {
    val m = TextClassifier.export(TextClassifier.fit(corpus, "text", "y", k = 8))
    // parquet-backed input: a local Seq relation constant-folds the whole
    // projection away (ConvertToLocalRelation) and proves nothing
    val dir = java.nio.file.Files.createTempDirectory("textclf_plan").toString
    corpus.write.mode("overwrite").parquet(dir)
    // CollapseProject must keep the kernel projection separate from the
    // k feature extractions (non-cheap alias, multiply referenced) — if
    // it ever inlines, the kernel appears once per f_j reference and
    // scoring cost multiplies by k
    val plan = TextClassifier.score(m, spark.read.parquet(dir), "text")
      .queryExecution.executedPlan.toString.toLowerCase
    val hits = "md5bucketcounts".r.findAllIn(plan).length
    assert(hits == 1,
      s"expected exactly one kernel site in the plan, got $hits:\n$plan")
  }

  test("gateCol kernel decision == scored margin >= bar, row-for-row") {
    val k = 32
    val m = TextClassifier.export(TextClassifier.fit(corpus, "text", "y", k = k))
    val edge = Seq((200L, ""), (201L, "   "), (202L, "the the the"))
      .toDF("doc_id", "text").select(col("doc_id"), col("text"),
        lit(0.0).as("y"))
    val docs = corpus.unionByName(edge)
    // bars that land strictly inside, at zero, and outside the margin
    // range — the >= boundary must agree everywhere
    for (bar <- Seq(-2.0, 0.0, 1.5)) {
      val viaScore = TextClassifier.score(m, docs, "text")
        .filter(col("margin") >= bar)
        .select("doc_id").as[Long].collect().toSet
      val viaGate = docs.filter(TextClassifier.gateCol(m, col("text"), bar))
        .select("doc_id").as[Long].collect().toSet
      assert(viaGate == viaScore, s"gate kernel diverged at bar=$bar")
    }
  }

  test("drift contract: sidecar baseline + live batch row, hand-checked; predates-stats refused") {
    val m = TextClassifier.export(TextClassifier.fit(corpus, "text", "y", k = 16))
    val dir = java.nio.file.Files.createTempDirectory("textclf_drift").toString
    TextClassifier.save(spark, m, dir)
    // no sidecar yet -> loud refusal
    intercept[IllegalArgumentException] {
      TextClassifier.driftStats(spark, dir, corpus, "text")
    }
    TextClassifier.writeDriftSidecar(spark, dir, corpus, "text")
    val batch = corpus.filter(col("doc_id") < 100)
    val rows = TextClassifier.driftStats(spark, dir, batch, "text")
      .orderBy("src").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("batch", "build"))
    // hand-compute both sums from the scored margins
    def sumMicro(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val ms = TextClassifier.score(m, df, "text")
        .select("margin").as[Double].collect()
      (ms.length.toLong,
        ms.map(x => BigDecimal(x * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum)
    }
    val (bn, bs) = sumMicro(batch)
    val (cn, cs) = sumMicro(corpus)
    assert((rows(0).getLong(1), rows(0).getLong(2)) == ((bn, bs)))
    assert((rows(1).getLong(1), rows(1).getLong(2)) == ((cn, cs)))
  }

  test("export/save/load: bit-identical round trip; served scoring == live; torn artifact refused") {
    val fit = TextClassifier.fit(corpus, "text", "y", k = 32)
    val m = TextClassifier.export(fit)
    assert(m.k == 32 && m.coefficients.length == 32)
    val dir = java.nio.file.Files.createTempDirectory("textclf").toString
    TextClassifier.save(spark, m, s"$dir/ok")
    val loaded = TextClassifier.load(spark, s"$dir/ok")
    assert(loaded == m, "round trip must be bit-identical")
    // served scoring equals live scoring row-for-row (the q70 contract)
    val live = TextClassifier.score(fit, corpus, "text", k = 32)
      .select("doc_id", "margin", "pred").collect().map(_.toString).sorted.toSeq
    val served = TextClassifier.score(loaded, corpus, "text")
      .select("doc_id", "margin", "pred").collect().map(_.toString).sorted.toSeq
    assert(served == live)
    // torn artifact: coefs from a DIFFERENT k than the meta claims
    TextClassifier.save(spark,
      TextClassifier.export(TextClassifier.fit(corpus, "text", "y", k = 8)),
      s"$dir/torn")
    val p = new org.apache.hadoop.fs.Path(s"$dir/torn/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("""{"fmt": 1, "k": 32}""".getBytes)
    finally out.close()
    intercept[IllegalArgumentException] { TextClassifier.load(spark, s"$dir/torn") }
  }

  test("refitAndSwap: served == refit model, drift baseline restarts, crash windows recover") {
    val m0 = TextClassifier.export(TextClassifier.fit(corpus, "text", "y", k = 32))
    // the refit: labels flipped — genuinely different coefficients
    val flipped = corpus.withColumn("y", lit(1.0) - col("y"))
    val m1 = TextClassifier.export(TextClassifier.fit(flipped, "text", "y", k = 32))
    assert(m0 != m1, "refit fixture needs a genuinely different model")
    val dir = java.nio.file.Files.createTempDirectory("textclf_swap").toString
    val path = s"$dir/clf"
    // the serving lifecycle: publish m0 + its baseline, then swap in m1
    TextClassifier.save(spark, m0, path)
    TextClassifier.writeDriftSidecar(spark, path, corpus, "text")
    TextClassifier.refitAndSwap(spark, m1, corpus, "text", path)
    assert(TextClassifier.load(spark, path) == m1,
      "the refit model must actually be serving")
    // the drift clock restarted at the refit corpus: baseline == a fresh
    // save+writeDriftSidecar of m1 over the same corpus
    TextClassifier.save(spark, m1, s"$dir/fresh")
    TextClassifier.writeDriftSidecar(spark, s"$dir/fresh", corpus, "text")
    def buildRow(p: String) = TextClassifier.driftStats(spark, p, corpus, "text")
      .where(col("src") === "build").collect()
      .map(r => (r.getLong(1), r.getLong(2))).head
    assert(buildRow(path) == buildRow(s"$dir/fresh"),
      "swapped drift baseline != fresh baseline")
    // no stray swap dirs after a clean refresh
    val stray0 = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("clf.")).toSeq
    assert(stray0.isEmpty, s"clean refresh left stray dirs: $stray0")
    // mid-swap window: the live path is ABSENT between the renames — a
    // reader fails loudly; the swapped-out dir stays consistent
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$path.swap_old")
    assert(fs.rename(root, old))
    intercept[Exception] { TextClassifier.load(spark, path) }
    assert(TextClassifier.load(spark, old.toString) == m1,
      "the swapped-out artifact must stay internally consistent")
    // roll-BACK recovery: only .swap_old survives — a re-run restores it
    // first, then swaps in the refit
    TextClassifier.refitAndSwap(spark, m1, corpus, "text", path)
    assert(TextClassifier.load(spark, path) == m1, "roll-back recovery diverged")
    // roll-FORWARD recovery: a witness-complete staging survives with the
    // live path renamed out — a re-run promotes the staging first
    val staging = s"$path.swap_tmp"
    TextClassifier.save(spark, m0, staging)
    TextClassifier.writeDriftSidecar(spark, staging, corpus, "text")
    assert(fs.rename(root, old))
    TextClassifier.refitAndSwap(spark, m1, corpus, "text", path)
    assert(TextClassifier.load(spark, path) == m1, "roll-forward recovery diverged")
    // an INCOMPLETE staging (meta but no _drift witness) is never
    // promoted: recovery rolls back the old artifact instead
    TextClassifier.save(spark, m0, staging) // no drift sidecar
    assert(fs.rename(root, old))
    TextClassifier.refitAndSwap(spark, m1, corpus, "text", path)
    assert(TextClassifier.load(spark, path) == m1,
      "incomplete staging must not be promoted")
    val stray = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("clf.")).toSeq
    assert(stray.isEmpty, s"recovery left stray swap dirs: $stray")
    // first-time publish (no live artifact) is the same atomic path
    TextClassifier.refitAndSwap(spark, m1, corpus, "text", s"$dir/first")
    assert(TextClassifier.load(spark, s"$dir/first") == m1)
  }
}
