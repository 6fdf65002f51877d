package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextSignalExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val repetitive = ("spam " * 200).trim
  private val prose = Seq(
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "Seventeen judges of six kingdoms quietly vexed the pique of a gymnast.",
    "Compression ratios separate templated boilerplate from natural prose.",
    "Every operator in the engine is designed to hold at petabyte scale.",
    "Watermarks bound streaming state while sessions close on event time.",
    "A broadcast join ships the small side to every executor exactly once.",
    "Partition pruning skips whole directories before a single byte is read.",
    "The shuffle is the unit of cost; the plan is the unit of design."
  ).mkString(" ")
  // deterministic high-entropy stream over a 94-symbol printable alphabet:
  // xorshift64* chain, one printable char per step — deflate cannot model it
  private val noisy = {
    var x = 88172645463325252L
    (1 to 600).map { _ =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (33 + java.lang.Long.remainderUnsigned(x * 2685821657736338717L, 94L)).toChar
    }.mkString
  }

  test("deflate_ratio orders repetitive < prose < noise, all in (0, 2]") {
    val out = Seq((1L, repetitive), (2L, prose), (3L, noisy))
      .toDF("id", "text")
      .select(col("id"), TextSignalExpressions.deflateRatio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out.values.forall(r => r > 0 && r <= 2), s"bounds: $out")
    assert(out(1L) < out(2L), s"repetition must compress best: $out")
    assert(out(2L) < out(3L), s"prose must compress better than noise: $out")
    assert(out(1L) < 0.2, s"200x-repeated token should crush: ${out(1L)}")
  }

  test("eval and codegen agree bit-for-bit; empty -> 1.0; null -> null") {
    val df = Seq((1L, repetitive), (2L, prose), (3L, noisy), (4L, ""))
      .toDF("id", "text")
    val viaCodegen = df
      .select(col("id"), TextSignalExpressions.deflateRatio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    df.select(col("id"), col("text")).as[(Long, String)].collect().foreach {
      case (id, t) =>
        val interp = DeflateRatio(
          org.apache.spark.sql.catalyst.expressions.Literal(
            UTF8String.fromString(t))).eval(null).asInstanceOf[Double]
        assert(interp == viaCodegen(id), s"id $id: $interp != ${viaCodegen(id)}")
    }
    assert(viaCodegen(4L) == 1.0)
    val n = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(TextSignalExpressions.deflateRatio(col("text")).as("r"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("deterministic across repeated evaluation and partition layout") {
    val df = spark.range(100).select(col("id"),
      concat_ws(" ", lit("doc"), col("id"),
        lit("shared vocabulary of the corpus")).as("text"))
    val a = df.repartition(7)
      .select(col("id"), TextSignalExpressions.deflateRatio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    val b = df.coalesce(1)
      .select(col("id"), TextSignalExpressions.deflateRatio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
