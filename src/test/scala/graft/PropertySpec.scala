package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5.2-3): imputation totality,
  * metric ranges and invariances, fold-assignment partition laws, union
  * count conservation, per-group sampling cardinality.
  *
  * Uses ScalaCheck generators driven by a fixed-seed sampler (each case is
  * a Spark job, so the case count is kept small and deterministic).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministically draw `n` samples from `gen` and run `f` on each. */
  private def forSamples[A](gen: Gen[A], n: Int = 5)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(40)
    var seed = org.scalacheck.rng.Seed(42L)
    var drawn = 0
    var attempts = 0
    while (drawn < n && attempts < n * 20) {
      gen.apply(params, seed) match {
        case Some(a) => f(a); drawn += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    assert(drawn == n, s"generator too restrictive: only $drawn/$n samples")
  }

  private val rowsGen: Gen[List[(Long, Option[Double], Int)]] =
    Gen.nonEmptyListOf(for {
      age <- Gen.option(Gen.choose(0.0, 100.0))
      label <- Gen.choose(0, 1)
    } yield (age, label))
      .suchThat(_.exists(_._1.isDefined))
      .map(_.zipWithIndex.map { case ((a, l), i) => (i.toLong, a, l) })

  test("imputation never leaves nulls and preserves non-null values") {
    forSamples(rowsGen) { rows =>
      val df = rows.toDF("id", "age", "label")
      val out = Impute.meanImpute(df, Seq("age"))
      assert(out.filter(col("age").isNull).count() == 0)
      val changed = out.join(df.filter(col("age").isNotNull)
          .select(col("id"), col("age").as("orig")), "id")
        .filter(col("age") =!= col("orig")).count()
      assert(changed == 0, "non-null values must be preserved")
    }
  }

  private val predsGen: Gen[List[(Int, Int)]] =
    Gen.nonEmptyListOf(for {
      y <- Gen.choose(0, 1); p <- Gen.choose(0, 1)
    } yield (y, p))

  test("balanced accuracy is always in [0,1]") {
    forSamples(predsGen) { rows =>
      val df = rows.toDF("y", "p")
      val ba = Metrics.balancedAccuracy(df, col("y"), col("p"))
        .collect()(0).getDouble(0)
      assert(ba >= 0.0 && ba <= 1.0, s"BA=$ba out of range for $rows")
    }
  }

  private val scoresGen: Gen[List[(Int, Double)]] =
    Gen.listOfN(30, for {
      y <- Gen.choose(0, 1); s <- Gen.choose(0.0, 1.0)
    } yield (y, s)).suchThat(l => l.exists(_._1 == 0) && l.exists(_._1 == 1))

  test("AUROC is invariant under strictly monotone score transforms") {
    forSamples(scoresGen) { rows =>
      val df = rows.toDF("y", "s").cache()
      def au(c: org.apache.spark.sql.Column): Double =
        Metrics.auroc(df, col("y"), c).collect()(0).getDouble(0)
      val base = au(col("s"))
      assert(math.abs(au(col("s") * 3.0 + 7.0) - base) < 1e-9)
      assert(math.abs(au(exp(col("s"))) - base) < 1e-9)
      df.unpersist()
    }
  }

  test("fold assignment is a partition: exhaustive, in range, balanced per stratum") {
    forSamples(Gen.zip(Gen.choose(2, 7), Gen.choose(10, 60))) { case (k, n) =>
      val df = (0 until n).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "stratum")
      val folded = StratifiedFolds.assignRoundRobin(df, Seq(col("stratum")), k, col("id"))
      assert(folded.count() == n)
      assert(folded.filter(col("fold") < 0 || col("fold") >= k).count() == 0)
      val unbalanced = folded.groupBy("stratum", "fold").count()
        .groupBy("stratum").agg((max("count") - min("count")).as("spread"))
        .filter(col("spread") > 1).count()
      assert(unbalanced == 0, "round-robin must balance within each stratum")
    }
  }

  test("shingleJaccard: symmetric, bounded in [0,1], 1.0 iff equal shingle sets") {
    val wordGen = Gen.listOfN(2, Gen.oneOf("a", "b", "c", "dd")).map(_.mkString(""))
    val textGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    forSamples(Gen.zip(textGen, textGen), n = 8) { case (ta, tb) =>
      val r = Seq((ta, tb)).toDF("ta", "tb")
        .select(
          graft.expressions.WordShingles.shingleJaccard(col("ta"), col("tb"), 2).as("ab"),
          graft.expressions.WordShingles.shingleJaccard(col("tb"), col("ta"), 2).as("ba"),
          graft.expressions.WordShingles.shingleJaccard(col("ta"), col("ta"), 2).as("aa"))
        .as[(Double, Double, Double)].head()
      assert(r._1 == r._2, s"not symmetric on ($ta, $tb)")
      assert(r._1 >= 0.0 && r._1 <= 1.0, s"out of bounds on ($ta, $tb): ${r._1}")
      assert(r._3 == 1.0, s"self-jaccard != 1 on $ta")
      val sameSet = Seq((ta, tb)).toDF("ta", "tb")
        .select((array_sort(graft.functions.TextFunctions.shingles(col("ta"), 2)) ===
          array_sort(graft.functions.TextFunctions.shingles(col("tb"), 2))).as("eq"))
        .as[Boolean].head()
      assert((r._1 == 1.0) == sameSet, s"jaccard=1 iff equal sets violated on ($ta, $tb)")
    }
  }

  test("union + groupBy conserves row counts") {
    forSamples(Gen.zip(Gen.choose(1, 30), Gen.choose(1, 30))) { case (n1, n2) =>
      val a = (0 until n1).map(i => (i.toLong, "a")).toDF("id", "src")
      val b = (0 until n2).map(i => (i.toLong, "b")).toDF("id", "src")
      val u = a.unionByName(b)
      assert(u.count() == n1 + n2)
      assert(u.groupBy("src").count().as[(String, Long)].collect().toMap ==
        Map("a" -> n1.toLong, "b" -> n2.toLong))
    }
  }

  test("per-group sampling takes exactly min(k, group size) rows per group") {
    forSamples(Gen.zip(Gen.choose(1, 5), Gen.choose(5, 40))) { case (k, n) =>
      val df = (0 until n).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
      val sampled = Sampling.takePerGroup(df, Seq(col("g")), k,
        Sampling.pseudoRand(col("id")))
      val bad = sampled.groupBy("g").count()
        .join(df.groupBy("g").count().withColumnRenamed("count", "total"), "g")
        .filter(col("count") =!= least(lit(k), col("total"))).count()
      assert(bad == 0)
    }
  }

  test("chunkDocs -> packSequences composition conserves tokens end-to-end") {
    // the training-data shape: chunk a corpus, then pack chunks into
    // ~budget-token sequences. Invariants over a (chunk, overlap, budget)
    // grid: every chunk lands in exactly one pack; per-pack token sums add
    // up to the chunk total, which equals the corpus token total plus the
    // overlap duplication (nChunks-1 per doc); and every row obeys the
    // greedy floor(exclusive-cum/budget) law (ids start at 0, are
    // monotone in pack order, and may legally skip when one oversized
    // chunk spans several budget units).
    val caseGen = for {
      nDocs <- Gen.choose(1, 8)
      chunk <- Gen.choose(2, 40)
      overlap <- Gen.choose(0, chunk - 1)
      budget <- Gen.choose(1L, 150L)
    } yield (nDocs, chunk, overlap, budget)
    forSamples(caseGen, n = 6) { case (nDocs, chunk, overlap, budget) =>
      val docs = (1 to nDocs).map { d =>
        val n = (d * 37) % 90 + 1            // deterministic varied lengths
        (d.toLong, (1 to n).map(i => s"d${d}w$i").mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val chunks = Curate.chunkDocs(df, "doc_id", "text", chunk, overlap)
        .withColumn("__ord", col("doc_id") * 1000 + col("chunk_id"))
      val packed = Curate.packSequences(chunks, "n_tokens", "__ord", budget)
        .select("doc_id", "chunk_id", "n_tokens", "pack_id", "__ord")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._5)
      assert(packed.length ==
        chunks.count().toInt, "packing must not drop or duplicate chunks")
      // token conservation: chunk totals = corpus totals + overlap dup
      val chunkTotal = packed.map(_._3).sum
      val stride = chunk - overlap
      val expected = docs.map { case (_, text) =>
        val n = text.split(" ").length.toLong
        val nChunks = if (n <= chunk) 1L
                      else ((n - chunk) + stride - 1) / stride + 1L
        n + (nChunks - 1) * overlap
      }.sum
      assert(chunkTotal == expected,
        s"token conservation: chunks $chunkTotal != docs+overlap $expected")
      // the greedy prefix-sum law (also forces start-at-0 and monotonicity)
      var cum = 0L
      packed.foreach { case (_, _, n, pid, _) =>
        assert(pid == cum / budget,
          s"pack id law broken at cum=$cum budget=$budget: got $pid")
        cum += n
      }
    }
  }

  test("chunkDocs: every token covered, overlap exact, for random budgets") {
    val caseGen = for {
      nTokens <- Gen.choose(1, 300)
      chunk <- Gen.choose(2, 80)
      overlap <- Gen.choose(0, chunk - 1)
    } yield (nTokens, chunk, overlap)
    forSamples(caseGen, n = 6) { case (nTokens, chunk, overlap) =>
      val words = (1 to nTokens).map(i => s"w$i")
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = Curate.chunkDocs(df, "doc_id", "text", chunk, overlap)
        .orderBy("chunk_id")
        .select("chunk_id", "chunk", "n_tokens")
        .as[(Long, String, Long)].collect().toSeq
      // dense ids, each chunk within budget, advertised size truthful
      assert(chunks.map(_._1) == chunks.indices.map(_.toLong))
      chunks.foreach { case (k, c, n) =>
        val toks = c.split(" ").toSeq
        assert(toks.size == n && n <= chunk, s"chunk $k size $n budget $chunk")
        assert(toks == words.slice((k * (chunk - overlap)).toInt,
          (k * (chunk - overlap)).toInt + chunk), s"chunk $k content")
      }
      // de-overlapped concatenation rebuilds the document exactly
      val rebuilt = chunks.map(_._2.split(" ").toSeq)
        .reduce((a, b) => a ++ b.drop(overlap))
      assert(rebuilt == words,
        s"coverage failed for n=$nTokens chunk=$chunk overlap=$overlap")
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    words <- Gen.listOfN(n,
      Gen.oneOf("a", "bb", "ccc", "a", "dd", "e", "bb"))
  } yield words.mkString(" ")

  test("TermCounts kernel equals the explode+groupBy aggregate form") {
    forSamples(Gen.listOfN(4, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kernel = df.select(col("doc_id"),
          explode(graft.expressions.WordShingles.termCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.term"), col("tc.tf"))
        .as[(Long, String, Long)].collect().toSet
      val agg = df.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .as[(Long, String, Long)].collect().toSet
      assert(kernel == agg, s"texts=$texts")
    }
  }

  test("RepetitionStats kernel equals the two-level aggregate form") {
    forSamples(Gen.listOfN(4, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kernel = Curate.repetitionStats(df, "doc_id", "text", n = 2)
        .as[(Long, Long, Double, Double)].collect().toSet
      val grams = df.select(col("doc_id"),
        explode(graft.expressions.WordShingles.ngrams(col("text"), 2)).as("g"))
      val agg = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_grams"),
          (max(col("c")).cast("double") / sum(col("c"))).as("top_ngram_frac"),
          (count(lit(1)).cast("double") / sum(col("c"))).as("distinct_frac"))
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(kernel == agg, s"texts=$texts")
    }
  }

  test("GramCounts kernel equals the strict-window explode+groupBy form") {
    forSamples(Gen.listOfN(4, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (n <- Seq(1, 2, 3)) {
        val kernel = df.select(col("doc_id"),
            explode(graft.expressions.WordShingles.gramCounts(col("text"), n)).as("g"))
          .select(col("doc_id"), col("g.gram"), col("g.cnt"))
          .as[(Long, String, Long)].collect().toSet
        // strict-window reference: zip n slices of the token array
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        val grams = df.select(col("doc_id"), toks.as("t"))
          .select(col("doc_id"), explode(
            when(size(col("t")) >= n,
              transform(sequence(lit(0), size(col("t")) - n),
                i => concat_ws(" ", slice(col("t"), i + 1, lit(n)))))
              .otherwise(array().cast("array<string>"))).as("gram"))
        val agg = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
          .as[(Long, String, Long)].collect().toSet
        assert(kernel == agg, s"n=$n texts=$texts")
      }
    }
  }

  test("BigramLmScore kernel equals the join-scoring form on random corpora") {
    forSamples(Gen.zip(Gen.listOfN(5, textGen), Gen.listOfN(5, textGen)),
      n = 4) { case (fitTexts, probeTexts) =>
      val fitDf = fitTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val probeDf = probeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // cap=3 binds on the 5-word alphabet, exercising truncation + OOV
      val m = graft.ml.NgramLm.fit(fitDf, col("text"), uniCap = 3, biCap = 3)
        .asInstanceOf[graft.ml.NgramLm.BigramLm]
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      val k = rows(graft.ml.NgramLm.scoreDocsKernel(
        probeDf, col("doc_id"), col("text"), m))
      val j = rows(graft.ml.NgramLm.scoreDocsJoined(
        probeDf, col("doc_id"), col("text"), m))
      assert(k == j, s"fit=$fitTexts probe=$probeTexts")
    }
  }

  test("ExactSubstr fused kernels equal the composed forms on random corpora") {
    // random small-alphabet docs with irregular whitespace maximize window
    // collisions, gap-k island merges, short-doc clamps, and full covers —
    // the fused SpanIslands/SpanKeep path must be row-identical to the
    // retained composed specification on every draw
    val word = Gen.oneOf("a", "b", "c", "aa")
    val sep = Gen.oneOf(" ", "  ", "\n", "\t ")
    val messyText: Gen[String] = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
      pad <- Gen.oneOf("", " ", "  ")
    } yield pad + ws.zipAll(ss, "", "").map { case (w, s) => w + s }
      .mkString + pad
    val corpusGen = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, messyText))
    forSamples(Gen.zip(corpusGen, Gen.choose(2, 4), Gen.choose(2, 3)),
      n = 6) { case (texts, k, minDocs) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy(d.columns.map(col).toIndexedSeq: _*)
          .collect().map(_.toSeq).toSeq
      val sF = rows(operators.Dedup.duplicatedSpans(df, "doc_id", "text", k, minDocs))
      val sC = rows(operators.Dedup.duplicatedSpansComposed(df, "doc_id", "text", k, minDocs))
      assert(sF == sC, s"span report diverged: texts=$texts k=$k minDocs=$minDocs")
      val rF = rows(operators.Dedup.removeDuplicatedSpans(df, "doc_id", "text", k, minDocs))
      val rC = rows(operators.Dedup.removeDuplicatedSpansComposed(df, "doc_id", "text", k, minDocs))
      assert(rF == rC, s"span removal diverged: texts=$texts k=$k minDocs=$minDocs")
    }
  }
}
