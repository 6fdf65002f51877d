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
