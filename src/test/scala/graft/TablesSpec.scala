package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the events loader's handling of BOTH physical `ts` forms the
  * driver-generated parquet has shipped with: TIMESTAMP(MICROS) (the
  * current generation — read natively through an explicit TimestampType
  * schema) and int64 nanoseconds (the earlier generation, which Spark's
  * reader can't resolve natively — read via schema override and divided
  * to micros). The on-disk testdata only ever carries ONE form, so the
  * other branch would otherwise go unexercised until the next
  * regeneration flipped it back.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: java.nio.file.Path,
                          tsExpr: org.apache.spark.sql.Column): Unit =
    Seq((0L, 1704067207179575L, 8L, "error", 6.55, "{}"),
        (1L, 1704067432824425L, 46L, "click", 12.31, "{}"))
      .toDF("event_id", "raw", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsExpr).drop("raw")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("events loader: native micros timestamps land verbatim in ts_us") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_us")
    writeEvents(dir, timestamp_micros(col("raw")))
    val got = Tables.events(spark, dir.toString)
      .select("event_id", "ts_us").as[(Long, Long)].collect().toMap
    assert(got(0L) == 1704067207179575L && got(1L) == 1704067432824425L)
  }

  test("events loader: int64 ts column takes the nanos fallback") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_ns")
    // ts as a plain LONG column holding nanoseconds: native schema
    // resolution yields LongType (not a timestamp), so the loader must
    // take the override branch and divide to micros
    writeEvents(dir, (col("raw") * 1000L).as("ts"))
    val got = Tables.events(spark, dir.toString)
      .select("event_id", "ts_us").as[(Long, Long)].collect().toMap
    assert(got(0L) == 1704067207179575L && got(1L) == 1704067432824425L)
  }
}
