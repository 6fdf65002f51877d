package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine inputs are columnar parquet scans so Catalyst can push
  * predicates/projections into the scan (`PushedFilters`/`ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events.parquet's `ts` column has shipped in two physical forms across
    * testdata generations: TIMESTAMP(MICROS), which Spark reads natively,
    * and TIMESTAMP(NANOS), which Spark's parquet reader rejects outright
    * and must be read as a raw INT64 via schema override. Detect by
    * attempting native schema resolution, then normalize either form to
    * the same surface: a microsecond `TimestampType` `ts` (matching what
    * DuckDB sees when it reads the same file) plus the epoch-micros long
    * `ts_us` (the arithmetic-friendly form).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    // TIMESTAMP(MICROS) infers as TimestampNTZType (isAdjustedToUTC=false);
    // schema resolution for TIMESTAMP(NANOS) throws
    val nativeTs =
      try {
        val t = s.read.parquet(path).schema("ts").dataType
        t == org.apache.spark.sql.types.TimestampType ||
          t == org.apache.spark.sql.types.TimestampNTZType
      } catch { case _: Exception => false }
    if (nativeTs)
      // explicit TimestampType schema: the stored int64 micros land in the
      // column verbatim (no session-timezone shift), so unix_micros(ts)
      // equals DuckDB's epoch_us(ts) over the same file
      s.read
        .schema(StructType.fromDDL(
          "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"))
        .parquet(path)
        .withColumn("ts_us", unix_micros(col("ts")))
    else
      s.read
        .schema(StructType.fromDDL(
          "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"))
        .parquet(path)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_us", expr("ts_ns DIV 1000"))
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .drop("ts_ns")
  }
}
