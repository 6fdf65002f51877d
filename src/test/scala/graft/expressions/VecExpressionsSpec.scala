package graft.expressions

import graft.SparkSpec
import graft.expressions.VecExpressions.vecDot
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vecDot over float arrays matches hand-computed double math") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val d = df.select(vecDot(col("a"), col("b")).as("d")).as[Double].head()
    assert(d == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
  }

  test("vecDot accepts mixed float/double arrays") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(0.5, 0.25))).toDF("a", "b")
    val d = df.select(vecDot(col("a"), col("b")).as("d")).as[Double].head()
    assert(d == 1.0)
  }

  test("vecDot: null array -> null; null element skips the pair") {
    val df = Seq(
      (1L, Some(Seq[java.lang.Float](1.0f, null, 3.0f)), Some(Seq[java.lang.Float](1.0f, 1.0f, 1.0f))),
      (2L, None, Some(Seq[java.lang.Float](1.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), vecDot(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(4.0))
    assert(out(2L).isEmpty)
  }

  test("vecDot: null element paired with NaN contributes nothing in eval AND codegen") {
    // codegen path (column inputs)
    val viaCodegen = Seq(
      (Seq[java.lang.Float](null, 2.0f), Seq(Float.NaN, 3.0f))
    ).toDF("a", "b").select(vecDot(col("a"), col("b"))).as[Double].head()
    assert(viaCodegen == 6.0, s"codegen: $viaCodegen")
    // interpreted path: constant folding over literal arrays runs eval()
    val viaEval = spark.range(1).select(
      vecDot(typedlit(Seq(Option.empty[Float], Some(2.0f))),
        typedlit(Seq(Float.NaN, 3.0f)))).as[Double].head()
    assert(viaEval == 6.0,
      s"eval must skip null-paired elements exactly like codegen: $viaEval")
  }

  test("vecDot matches the interpreted zip_with/aggregate formulation") {
    val df = (0 until 50).map { i =>
      (i.toLong, (0 until 16).map(j => (i * 31 + j * 7 % 13 - 6).toFloat / 7f))
    }.toDF("id", "e")
    val a = df.as("a"); val b = df.as("b")
    val pairs = a.join(b, col("a.id") < col("b.id"))
    val native = pairs.select(vecDot(col("a.e"), col("b.e")).as("d")).as[Double].collect()
    val interp = pairs.select(
      aggregate(zip_with(col("a.e"), col("b.e"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("d")).as[Double].collect()
    assert(native.length == interp.length)
    native.zip(interp).foreach { case (n, i) => assert(math.abs(n - i) < 1e-9) }
  }

  test("vecDot: mismatched dimensions -> null, not a truncated partial product") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f)),   // mismatch
      (2L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))          // match
      .toDF("id", "a", "b")
    val out = df.select(col("id"), vecDot(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty, "dimension mismatch must surface as null")
    assert(out(2L).contains(11.0))
  }

  test("vecDot rejects non-array inputs at analysis time") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      df.select(vecDot(col("a"), col("b"))).collect()
    }
  }

  test("nearestCentroidCell matches a reference argmin at 64x64 (the size " +
      "that broke the unrolled chain's codegen)") {
    // deterministic pseudo-random centroids and vectors; the reference
    // computes the same |c|^2 - 2*v.c argmin with first-wins ties in Scala
    def pv(seed: Int, d: Int): Seq[Double] =
      (0 until d).map(j => (((seed * 1315423911L + j * 2654435761L) % 1000)
        .toDouble) / 500.0 - 1.0)
    val dim = 64
    val centroids = (0 until 64).map(i => pv(i + 7, dim))
    val c2 = centroids.map(c => c.map(x => x * x).sum)
    def refCell(v: Seq[Double]): Int = {
      var best = -1; var bestD = Double.PositiveInfinity
      centroids.indices.foreach { i =>
        val d = c2(i) - 2.0 * v.zip(centroids(i)).map { case (a, b) => a * b }.sum
        if (d < bestD) { bestD = d; best = i }
      }
      best
    }
    val vecs = (0 until 500).map(i => (i.toLong, pv(i + 991, dim)))
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"), VecExpressions
        .nearestCentroidCell(col("v"), centroids).as("cell"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refCell(v), s"cell mismatch for vec $id")
    }
    // float input goes through the float getter path
    val fdf = vecs.take(50).map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("id", "v")
    val gotF = fdf.select(col("id"), VecExpressions
        .nearestCentroidCell(col("v"), centroids).as("cell"))
      .as[(Long, Int)].collect().toMap
    // float rounding can move a near-tie across cells; spot-check a loose
    // agreement rate rather than exact equality
    val agree = vecs.take(50).count { case (id, v) => gotF(id) == refCell(v) }
    assert(agree >= 45, s"float path diverged on ${50 - agree}/50 vectors")
    // dimension mismatch -> null, not a truncated argmin
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val r = bad.select(VecExpressions.nearestCentroidCell(col("v"), centroids))
      .collect()(0)
    assert(r.isNullAt(0), "length mismatch must surface as null")
  }
}
