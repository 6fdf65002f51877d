package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given scale factor,
  * then times the same oracle SQL in DuckDB (via tools/duckdb_bench.py) so
  * the emitted line carries BOTH engines' per-query seconds — the
  * "within 2x of baseline" criterion is computable from the artifact alone.
  * Prints exactly one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init and one scan per table, so
    // the first measured query doesn't absorb ~5s of cold-start
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.names.foreach { t =>
        try Tables.load(spark, sfDir, t).limit(1).collect()
        catch { case _: Throwable => }
      }
      SparkEntry.entry(spark).collect()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val duckdb = duckdbBaseline(sfDir)
    def obj(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val dTotal = duckdb.values.filter(_ >= 0).sum
    // failed oracles time as -1.0 and are EXCLUDED from duckdb_total while
    // their Spark twins stay in `value` — surface the count so a non-zero
    // value flags that the two totals cover different query sets
    val dFailed = duckdb.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(results.toMap)},"duckdb":${obj(duckdb)},"duckdb_total":$dTotal,"duckdb_failed":$dFailed,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Per-query DuckDB seconds for every oracle-backed query, or empty when
    * python3/duckdb is unavailable (the Spark numbers still print).
    */
  private def duckdbBaseline(sfDir: String): Map[String, Double] = try {
    val tmp = java.nio.file.Files.createTempFile("graft_oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, JsonDump.oracleSqlJson)
    val script = new java.io.File("tools/duckdb_bench.py")
    if (!script.isFile) return Map.empty
    import scala.sys.process._
    val out = Seq("python3", script.getPath, sfDir, tmp.toString).!!.trim
    parseFlatJson(out)
  } catch { case _: Throwable => Map.empty }

  /** Parse a flat `{"name": seconds, ...}` object — regex keeps the bench
    * dependency-free. The exponent clause matters: json prints tiny
    * timings in scientific notation (1.2e-05), and one unparsable value
    * would silently discard the whole baseline. Unit-tested in BenchSpec.
    */
  private[graft] def parseFlatJson(out: String): Map[String, Double] =
    "\"([^\"]+)\"\\s*:\\s*(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)".r.findAllMatchIn(out)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
}
