package graft.ml

import graft.SparkSpec
import graft.expressions.BpeStats
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fit: hand-computed merges, weighted counts, ties, early stop") {
    val docs = Seq((1L, "low lower low"), (2L, "lowest low"))
      .toDF("doc_id", "text")
    // vocab: low=3 lower=1 lowest=1; pair counts (l,o)=5 (o,w)=5 (w,e)=2
    // (e,r)=1 (e,s)=1 (s,t)=1. Round 1 ties (l,o)/(o,w) at 5 -> lexicographic
    // ascending picks (l,o); round 4 has no pair with count >= 2 -> stop
    // early even though nMerges allows more.
    val m = BpeTokenizer.fit(docs, col("text"), vocabCap = 10, nMerges = 8)
    assert(m == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    // refit is bit-identical
    assert(BpeTokenizer.fit(docs, col("text"), 10, 8) == m)
    // vocab cap changes what the merges are learned FROM: cap 1 keeps only
    // "low", whose pairs all have weight 3
    val m1 = BpeTokenizer.fit(docs, col("text"), vocabCap = 1, nMerges = 8)
    assert(m1 == Seq(("l", "o"), ("lo", "w")))
  }

  test("tokenStats: per-doc counts match hand segmentation, OOV words pass through") {
    val docs = Seq((1L, "low lower low"), (2L, "lowest low"))
      .toDF("doc_id", "text")
    val m = BpeTokenizer.fit(docs, col("text"), 10, 8)
    val probe = Seq((1L, "low lower lowest xyz")).toDF("doc_id", "text")
    val out = BpeTokenizer.tokenStats(probe, col("doc_id"), col("text"), m)
      .collect().head
    // low -> [low]; lower -> [lowe, r]; lowest -> [lowe, s, t];
    // xyz (never seen by the fit) -> [x, y, z]
    assert(out.getLong(1) == 4L && out.getLong(2) == 1 + 2 + 3 + 3)
  }

  test("applyMerge == bracketed SQL replace(), including the boundary trap") {
    // the replica of the oracle's replace() chain: bracket every char,
    // apply each merge as one leftmost non-overlapping String.replace
    // (Java and DuckDB replace share those semantics), count '['
    def sqlReplay(word: String, merges: Seq[(String, String)]): Int = {
      var s = word.map(c => s"[$c]").mkString
      merges.foreach { case (l, r) => s = s.replace(s"[$l][$r]", s"[$l$r]") }
      s.count(_ == '[')
    }
    def kernel(word: String, merges: Seq[(String, String)]): Int = {
      var syms = word.map(_.toString).toArray
      merges.foreach { case (l, r) => syms = BpeStats.applyMerge(syms, l, r) }
      syms.length
    }
    // the trap that forces the bracketed representation: after (a,b) makes
    // symbol "ab", a SPACE-joined replay of (b,b) would falsely match the
    // 'b' ending "ab" against the next symbol 'b'; brackets anchor matches
    // to whole symbols, and the array semantics agree
    assert(kernel("aabb", Seq(("a", "b"), ("b", "b"))) == 3) // [a][ab][b]
    assert(sqlReplay("aabb", Seq(("a", "b"), ("b", "b"))) == 3)
    // non-overlap: "aaaa" with (a,a) merges pairwise, not cascading
    assert(kernel("aaaa", Seq(("a", "a"))) == 2)
    assert(sqlReplay("aaaa", Seq(("a", "a"))) == 2)
    assert(kernel("aaa", Seq(("a", "a"))) == 2) // [aa][a]
    assert(sqlReplay("aaa", Seq(("a", "a"))) == 2)
    // exhaustive mini-fuzz: all words over {a,b} up to length 6 against
    // several realistic merge chains
    val chains = Seq(
      Seq(("a", "a")), Seq(("a", "b"), ("ab", "a")),
      Seq(("a", "b"), ("b", "b"), ("bb", "a")),
      Seq(("b", "a"), ("ba", "ba")),
      Seq(("a", "a"), ("aa", "aa"), ("b", "b")))
    val words = (1 to 6).flatMap(n =>
      (0 until (1 << n)).map(bits =>
        (0 until n).map(i => if ((bits >> i & 1) == 0) 'a' else 'b').mkString))
    for (w <- words; ch <- chains)
      assert(kernel(w, ch) == sqlReplay(w, ch),
        s"word=$w chain=$ch kernel=${kernel(w, ch)} sql=${sqlReplay(w, ch)}")
  }

  test("fitModel: alphabet is the capped vocab's sorted symbols; vocabIds first-wins") {
    val docs = Seq((1L, "low lower low"), (2L, "lowest low"))
      .toDF("doc_id", "text")
    val m = BpeTokenizer.fitModel(docs, col("text"), vocabCap = 10, nMerges = 8)
    assert(m.merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(m.alphabet.toSeq == Seq("e", "l", "o", "r", "s", "t", "w"))
    // ids: alphabet 0..6 sorted, then merge products in rank order
    assert(m.vocabIds == Map("e" -> 0, "l" -> 1, "o" -> 2, "r" -> 3,
      "s" -> 4, "t" -> 5, "w" -> 6, "lo" -> 7, "low" -> 8, "lowe" -> 9))
    // first-wins: a merge whose product collides with an existing token
    // does not reassign the id
    val collide = BpeTokenizer.BpeModel(Array("a", "aa"),
      Seq(("a", "a"), ("aa", "a")))
    assert(collide.vocabIds == Map("a" -> 0, "aa" -> 1, "aaa" -> 2))
  }

  test("save/load round-trips the model bit-for-bit") {
    val docs = Seq((1L, "low lower low"), (2L, "lowest low"))
      .toDF("doc_id", "text")
    val m = BpeTokenizer.fitModel(docs, col("text"), 10, 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe_rt").toString
    BpeTokenizer.save(spark, m, dir)
    val m2 = BpeTokenizer.load(spark, dir)
    assert(m2.alphabet.sameElements(m.alphabet))
    assert(m2.merges == m.merges)
    assert(m2.vocabIds == m.vocabIds)
    // a loaded model segments identically to the fitted one
    val probe = Seq((1L, "low lower lowest xyz")).toDF("doc_id", "text")
    def ids(mm: BpeTokenizer.BpeModel) =
      BpeTokenizer.segmentIds(probe, col("doc_id"), col("text"), mm)
        .collect().head.getSeq[Int](1)
    assert(ids(m2) == ids(m))
    // torn artifact (meta disagrees with rows) fails loudly — rewrite the
    // sidecar through the same Hadoop FS save() used (a raw java.nio write
    // would orphan the local FS checksum file)
    val mp = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(mp, true)
    try o.write("""{"fmt": 1, "nAlphabet": 99, "nMerges": 3}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o.close()
    intercept[IllegalArgumentException] { BpeTokenizer.load(spark, dir) }
  }

  test("segmentIds: hand-computed id sequences, UNK for unseen codepoints") {
    val docs = Seq((1L, "low lower low"), (2L, "lowest low"))
      .toDF("doc_id", "text")
    val m = BpeTokenizer.fitModel(docs, col("text"), 10, 8)
    // low -> [low=8]; lower -> [lowe=9, r=3]; lowest -> [lowe=9, s=4, t=5];
    // xyz (codepoints outside the alphabet) -> [-1, -1, -1]
    val probe = Seq((1L, "low lower lowest xyz")).toDF("doc_id", "text")
    val out = BpeTokenizer.segmentIds(probe, col("doc_id"), col("text"), m)
      .collect().head.getSeq[Int](1)
    assert(out == Seq(8, 9, 3, 9, 4, 5, -1, -1, -1))
    // the ids kernel is a pure projection (zero shuffle, no joins)
    val plan = BpeTokenizer.segmentIds(probe, col("doc_id"), col("text"), m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
    // token count agrees with BpeStats on every doc (two kernels, one
    // segmentation semantics)
    val both = BpeTokenizer.tokenStats(docs, col("doc_id"), col("text"), m.merges)
      .join(BpeTokenizer.segmentIds(docs, col("doc_id"), col("text"), m), "doc_id")
      .select(col("n_tokens"), size(col("token_ids")).cast("long"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("BpeStats kernel is a pure projection; rejects bracket symbols") {
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val plan = BpeTokenizer.tokenStats(docs, col("doc_id"), col("text"),
        Seq(("a", "b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
    // a merge containing a bracket would break the oracle representation —
    // the expression refuses it at analysis
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(BpeStats(col("text"), Array(("[", "x")))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("bracket"))
  }
}
