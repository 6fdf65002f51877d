package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native kernels are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), "the quick brown fox the quick"))
      .toDF("a", "b", "text").createOrReplaceTempView("ext_t")

    val dot = spark.sql("SELECT vec_dot(a, b) FROM ext_t").as[Double].head()
    assert(dot == 11.0)

    val sh = spark.sql("SELECT word_shingles(text, 2) FROM ext_t")
      .as[Seq[String]].head()
    assert(sh == Seq("the quick", "quick brown", "brown fox", "fox the"))

    val sig = spark.sql(
      "SELECT minhash_signature(word_shingles(text, 3), 8) FROM ext_t")
      .as[Seq[Long]].head()
    assert(sig.length == 8)

    // SQL simhash64 equals the operator-level result
    val sqlSim = spark.sql("SELECT simhash64(split(trim(text), '\\\\s+')) FROM ext_t")
      .as[Long].head()
    val opSim = Seq((1L, "the quick brown fox the quick")).toDF("id", "text")
      .select(graft.operators.Dedup.simhash64(col("text"))).as[Long].head()
    assert(sqlSim == opSim)

    // fused jaccard: identical texts -> 1.0; equals the Column-level kernel
    val jac = spark.sql("SELECT shingle_jaccard(text, text, 3) FROM ext_t")
      .as[Double].head()
    assert(jac == 1.0)

    // srp_signature equals the Column-level kernel (same planes + seed)
    val sqlSrp = spark.sql("SELECT srp_signature(a, 8, 42) FROM ext_t")
      .as[Long].head()
    val opSrp = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "embedding")
      .select(graft.operators.Similarity.srpSignature(col("embedding"), 8, 42L))
      .as[Long].head()
    assert(sqlSrp == opSrp)

    // gram_counts: strict-window per-doc gram counts from SQL
    val gc = spark.sql("SELECT gram_counts(text, 2) FROM ext_t")
      .as[Seq[(String, Long)]].head()
    assert(gc.toMap == Map("the quick" -> 2L, "quick brown" -> 1L,
      "brown fox" -> 1L, "fox the" -> 1L))
  }

  test("extensions class registers via SparkSessionExtensions (builder path)") {
    // apply() must wire every builder without throwing; full builder-path
    // coverage would need a fresh JVM session, so assert the injection hook
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
