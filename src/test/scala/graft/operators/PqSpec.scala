package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // m=2 subspaces of 2 dims; hand-built codebooks
  private val cbs: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
    Seq(Seq(0.0, 0.0), Seq(2.0, 2.0)))

  private def vecs = Seq(
    (1L, Seq(0.9f, 0.9f, 1.9f, 1.9f)), // codes (1, 1)
    (2L, Seq(0.1f, 0.1f, 0.1f, 0.1f)), // codes (0, 0)
    (3L, Seq(0.5f, 0.5f, 1.0f, 1.0f))  // sub0 EQUIDISTANT -> tie to cid 0
  ).toDF("vec_id", "embedding")

  // the kernel's exact fixed-point chain
  private def subD(a: Seq[Float], c: Seq[Double]): Long =
    a.zip(c).map { case (x, y) =>
      val d = x.toDouble - y
      graft.expressions.BigramLmScore.halfUp(1e9 * (d * d))
    }.sum

  test("PqEncode: argmin per subspace, ties to the lowest centroid id") {
    val out = vecs.select(col("vec_id"),
        graft.expressions.PqEncode(col("embedding"), cbs).as("codes"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    assert(out.toSeq == Seq(
      (1L, Seq(1, 1)), (2L, Seq(0, 0)), (3L, Seq(0, 0))))
    // tie really is a tie on the integer grid
    assert(subD(Seq(0.5f, 0.5f), cbs(0)(0)) == subD(Seq(0.5f, 0.5f), cbs(0)(1)))
    // geometry mismatch -> null, not a truncated code
    val bad = Seq((9L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
      .select(graft.expressions.PqEncode(col("embedding"), cbs).as("codes"))
      .collect().head
    assert(bad.isNullAt(0))
  }

  test("pqTopK: exact integer ADC totals and (dist, id) top-k order") {
    val q = Seq((100L, Seq(1.0f, 1.0f, 2.0f, 2.0f))).toDF("query_id", "embedding")
    val out = Similarity.pqTopK(vecs, "vec_id", q, "query_id", k = 2, cbs)
      .orderBy("dist", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ADC recomputed by hand from each doc's codes
    val qv = Seq(1.0f, 1.0f, 2.0f, 2.0f)
    def adc(c0: Int, c1: Int): Long =
      subD(qv.take(2), cbs(0)(c0)) + subD(qv.drop(2), cbs(1)(c1))
    val d1 = adc(1, 1) // doc 1: exact centroid hit -> 0
    val d2 = adc(0, 0)
    val d3 = adc(0, 0) // same codes as doc 2 -> same dist, id breaks the tie
    assert(d1 == 0L && d2 == d3)
    assert(out.toSeq == Seq((100L, 1L, d1), (100L, 2L, d2)))
    // k=3 admits doc 3 AFTER doc 2 on the id tie-break
    val all = Similarity.pqTopK(vecs, "vec_id", q, "query_id", k = 3, cbs)
      .orderBy("dist", "vec_id").select("vec_id").as[Long].collect().toSeq
    assert(all == Seq(1L, 2L, 3L))
  }

  test("fitPq: deterministic, rectangular, subspace geometry enforced") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.fitPq(emb, m = 4, codebookSize = 8)
    val b = Similarity.fitPq(emb, m = 4, codebookSize = 8)
    assert(a == b, "refit must be bit-identical")
    assert(a.size == 4 && a.forall(_.size == 8) &&
      a.forall(_.forall(_.size == 16)))
    intercept[IllegalArgumentException] {
      Similarity.fitPq(emb, m = 7, codebookSize = 8) // 64 % 7 != 0
    }
  }

  test("pqTopK plan: broadcast query side, no sort-merge join, no window") {
    val q = Seq((100L, Seq(1.0f, 1.0f, 2.0f, 2.0f))).toDF("query_id", "embedding")
    val plan = Similarity.pqTopK(vecs, "vec_id", q, "query_id", k = 2, cbs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
