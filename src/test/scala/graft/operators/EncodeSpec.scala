package graft.operators

import graft.SparkSpec

class EncodeSpec extends SparkSpec {
  import spark.implicits._

  test("quantileBuckets yields near-equal bucket sizes, stratification-ready") {
    val df = (0 until 1000).map(i => (i.toLong, (i * i % 997).toDouble)).toDF("id", "v")
    val out = Encode.quantileBuckets(df, "v", nBuckets = 4, out = "b")
    val sizes = out.groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    sizes.values.foreach(n =>
      assert(n >= 150 && n <= 350, s"equal-frequency-ish buckets, got $sizes"))
  }

  test("scale01 maps min->0, max->1, midpoint->0.5") {
    val df = Seq(0.0, 5.0, 10.0).toDF("v")
    val out = Encode.scale01(df, "v", "s").orderBy("v").select("s").as[Double].collect()
    assert(out.toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("scale01 on a constant column yields 0.0 (sklearn scale-0 handling), not a divide error") {
    val out = Seq(5.0, 5.0, 5.0).toDF("v")
    val r = Encode.scale01(out, "v", "s").select("s").as[Double].collect()
    assert(r.toSeq == Seq(0.0, 0.0, 0.0), s"got ${r.toSeq}")
  }

  test("oneHotCols emits exactly one 1 per row, in the right slot") {
    val df = Seq(0, 1, 2, 1).toDF("loc")
    val out = Encode.oneHotCols(df, "loc", Seq(0, 1, 2), "loc")
      .select("loc", "loc_0", "loc_1", "loc_2").as[(Int, Int, Int, Int)].collect()
    out.foreach { case (v, a, b, c) =>
      assert(a + b + c == 1)
      assert(Seq(a, b, c)(v) == 1)
    }
  }

  test("oneHotArray mirrors the reference's list-valued cells") {
    val df = Seq(2).toDF("loc")
    val out = Encode.oneHotArray(df, "loc", Seq(0, 1, 2), "oh")
      .select("oh").as[Seq[Int]].collect()
    assert(out(0) == Seq(0, 0, 1))
  }

  test("bucketize is right-INCLUSIVE at the boundaries (<=30 -> 0, <=60 -> 1, >60 -> 2)") {
    val df = Seq(29.0, 30.0, 30.5, 60.0, 60.0001, 99.0).toDF("age")
    val out = Encode.bucketize(df, "age", Seq(30.0, 60.0), "c")
      .orderBy("age").select("c").as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 1, 1, 2, 2))
  }

  test("bucketize keeps NULL input NULL instead of dumping it in the top bucket") {
    val df = Seq(Some(29.0), None, Some(99.0)).toDF("age")
    val out = Encode.bucketize(df, "age", Seq(30.0, 60.0), "c")
      .select("age", "c").as[(Option[Double], Option[Int])].collect().toMap
    assert(out(Some(29.0)).contains(0))
    assert(out(None).isEmpty, "null age must stay null")
    assert(out(Some(99.0)).contains(2))
  }
}
