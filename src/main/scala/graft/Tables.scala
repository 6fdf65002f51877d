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

  /** events.parquet carries TIMESTAMP(NANOS) — which Spark's parquet reader
    * rejects outright — so the loader reads `ts` as a raw INT64 via schema
    * override and derives both a microsecond-truncated `TimestampType` column
    * (`ts`, matching what DuckDB sees when it reads the same file) and the
    * epoch-micros long (`ts_us`, the arithmetic-friendly form).
    */
  def events(s: SparkSession, d: String): DataFrame =
    s.read
      .schema(StructType.fromDDL(
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"))
      .parquet(s"$d/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
}
