package graft.sources

import org.apache.spark.sql.SparkSession

/** The ONE read/write surface for the job-free JSON sidecars every
  * persisted model and drift baseline uses (meta.json, _drift.json):
  * create-overwrite through the path's Hadoop FileSystem, whole-file
  * UTF-8 read, and the tolerant integer-field parse (any spacing). The
  * four drift contracts and the index meta rewrite previously carried
  * near-identical copies of this boilerplate — a fix to any of them
  * (atomic temp-file writes, new fields) now lands once. Call sites
  * keep their own domain-specific error messages.
  */
private[graft] object JsonSidecar {

  def write(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The sidecar's full text, or None if the file does not exist. */
  def readOpt(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(p)),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  /** A (possibly negative) integer field, tolerant of any spacing. */
  def longField(json: String, key: String): Option[Long] =
    (s""""$key"\\s*:\\s*(-?\\d+)""").r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
}
