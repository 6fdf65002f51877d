package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct items fit the sketch (k - 1 >= vocabulary)") {
    val items = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c"))
    val df = scala.util.Random.shuffle(items).toDF("t").repartition(7)
    val m = df.agg(HeavyHitters.misraGries(col("t"), k = 10).as("hh"))
      .as[Map[String, Long]].collect()(0)
    assert(m == Map("a" -> 50L, "b" -> 30L, "c" -> 7L), s"got $m")
  }

  test("undercounts bounded by n/k; true heavy hitters always survive") {
    // 1000 items: "hot" 400 times, 600 singletons; k=5 -> n/k = 200
    val items = Seq.fill(400)("hot") ++ (1 to 600).map(i => s"rare$i")
    val df = scala.util.Random.shuffle(items).toDF("t").repartition(7)
    val m = df.agg(HeavyHitters.misraGries(col("t"), k = 5).as("hh"))
      .as[Map[String, Long]].collect()(0)
    assert(m.contains("hot"), s"freq 400 > n/k=200 must survive: $m")
    assert(m("hot") <= 400L && m("hot") >= 400L - 200L,
      s"undercount must be <= n/k: ${m("hot")}")
    assert(m.size <= 4, s"summary bounded by k-1: ${m.size}")
  }

  test("partition layout cannot break exactness below capacity") {
    val items = (1 to 20).flatMap(i => Seq.fill(i)(s"w$i"))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 3, 16).foreach { parts =>
      val m = items.toDF("t").repartition(parts)
        .agg(HeavyHitters.misraGries(col("t"), k = 40).as("hh"))
        .as[Map[String, Long]].collect()(0)
      assert(m == exact, s"parts=$parts: $m")
    }
  }
}
