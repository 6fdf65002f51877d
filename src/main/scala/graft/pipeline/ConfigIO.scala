package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** A7: YAML experiment-config ingestion — the reference's multi-experiment
  * driver is config-file driven (`training_scripts/run_experiments.py:11-17`
  * globs the yaml files under `cfgs_v0`; `main.py:10-56` argparses the
  * same keys), and
  * this is the equivalent surface: parse each config into
  * [[Experiment.Config]] and loop experiments in ONE SparkSession (one JVM,
  * one set of cached tables — the reference pays a fresh process per
  * config).
  *
  * The parser is a deliberate dependency-free YAML SUBSET — exactly the
  * shape experiment configs use (the reference's configs are flat
  * hyperparameter maps): `key: value` scalars, inline `[a, b]` lists,
  * block `- item` lists, quoted strings, `#` comments, blank lines.
  * Anchors, nesting, multi-docs are out of scope and rejected loudly
  * rather than misparsed. Config parsing is DRIVER-SIDE by design (a few
  * hundred bytes per experiment) — the cluster never sees YAML.
  */
object ConfigIO {

  /** Parse the YAML subset into key -> scalar | list. Fails loudly on
    * anything outside the subset (indentation-nested maps, unkeyed items).
    */
  private[pipeline] def parseYamlMap(text: String): Map[String, Any] = {
    val lines = text.linesIterator.toSeq
      .map(stripComment)
      .map(_.replaceAll("\\s+$", ""))
    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    var pendingListKey: Option[String] = None
    lines.foreach { line =>
      val t = line.trim
      if (t.isEmpty) ()                         // blank / comment-only
      else if (t.startsWith("- ") || t == "-") { // block-list item
        val key = pendingListKey.getOrElse(
          sys.error(s"yaml subset: list item '$t' without a preceding 'key:' line"))
        val item = scalar(t.drop(1).trim)
        out(key) = out(key).asInstanceOf[Vector[Any]] :+ item
      } else if (t.contains(":")) {
        val (k, vRaw) = t.splitAt(t.indexOf(':'))
        val key = unquote(k.trim)
        require(!key.isEmpty, s"yaml subset: empty key in line '$t'")
        val v = vRaw.drop(1).trim
        if (v.isEmpty) {                        // block list follows
          out(key) = Vector.empty[Any]
          pendingListKey = Some(key)
        } else {
          out(key) = if (v.startsWith("[")) inlineList(v) else scalar(v)
          pendingListKey = None
        }
      } else sys.error(s"yaml subset: unparseable line '$t'")
    }
    out.toMap
  }

  private def stripComment(line: String): String = {
    // a '#' starts a comment unless inside quotes — configs in the subset
    // never put '#' in values, so a quote-aware scan is sufficient
    var inS = false; var inD = false
    val i = line.indices.find { i =>
      line(i) match {
        case '\'' if !inD => inS = !inS; false
        case '"' if !inS  => inD = !inD; false
        case '#' if !inS && !inD => true
        case _ => false
      }
    }
    i.map(line.substring(0, _)).getOrElse(line)
  }

  private def inlineList(v: String): Vector[Any] = {
    require(v.endsWith("]"), s"yaml subset: unterminated inline list '$v'")
    val body = v.substring(1, v.length - 1).trim
    if (body.isEmpty) Vector.empty
    else body.split(",").toVector.map(s => scalar(s.trim))
  }

  /** Scalar typing: int, double, boolean, else (unquoted) string. */
  private def scalar(v: String): Any = {
    val s = unquote(v)
    if (s != v) s                               // quoted -> always string
    else s.toLongOption.orElse(s.toDoubleOption)
      .orElse(s.toLowerCase match {
        case "true" => Some(true); case "false" => Some(false); case _ => None
      }).getOrElse(s)
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') ||
        (s.head == '\'' && s.last == '\''))) s.substring(1, s.length - 1)
    else s

  /** Materialize an [[Experiment.Config]] from parsed keys (snake_case, the
    * reference's hyperparameter names where they exist). Unknown keys fail
    * loudly — a typo'd hyperparameter silently running the default is the
    * classic config-driven-experiment footgun.
    */
  def configFromMap(m: Map[String, Any]): Experiment.Config = {
    val known = Set("n_folds", "n_val", "n_test", "age_col", "cat_cols",
      "label_col", "slide_col", "rollup_threshold", "fusion_threshold")
    val unknown = m.keySet -- known
    require(unknown.isEmpty,
      s"unknown config keys: ${unknown.mkString(", ")} (known: ${known.toSeq.sorted.mkString(", ")})")
    def int(k: String, d: Int): Int = m.get(k).map {
      case l: Long => l.toInt
      case x => sys.error(s"config key $k: expected int, got $x")
    }.getOrElse(d)
    def dbl(k: String, d: Double): Double = m.get(k).map {
      case l: Long => l.toDouble
      case x: Double => x
      case x => sys.error(s"config key $k: expected number, got $x")
    }.getOrElse(d)
    def str(k: String, d: String): String = m.get(k).map {
      case s: String => s
      case x => sys.error(s"config key $k: expected string, got $x")
    }.getOrElse(d)
    def strs(k: String, d: Seq[String]): Seq[String] = m.get(k).map {
      case v: Vector[_] => v.map {
        case s: String => s
        case x => sys.error(s"config key $k: expected string list item, got $x")
      }
      case x => sys.error(s"config key $k: expected list, got $x")
    }.getOrElse(d)
    val defaults = Experiment.Config()
    Experiment.Config(
      nFolds = int("n_folds", defaults.nFolds),
      nVal = int("n_val", defaults.nVal),
      nTest = int("n_test", defaults.nTest),
      ageCol = str("age_col", defaults.ageCol),
      catCols = strs("cat_cols", defaults.catCols),
      labelCol = str("label_col", defaults.labelCol),
      slideCol = str("slide_col", defaults.slideCol),
      rollupThreshold = dbl("rollup_threshold", defaults.rollupThreshold),
      fusionThreshold = dbl("fusion_threshold", defaults.fusionThreshold))
  }

  /** Parse one YAML config text into an [[Experiment.Config]]. */
  def parseConfig(text: String): Experiment.Config =
    configFromMap(parseYamlMap(text))

  /** Load every `*.yaml` in a directory, sorted by file name — the
    * `run_experiments.py:11-17` glob loop. Returns (experiment name =
    * file basename, config) pairs.
    */
  def loadConfigs(dir: String): Seq[(String, Experiment.Config)] =
    Files.list(Paths.get(dir)).iterator.asScala.toSeq
      .filter(p => p.getFileName.toString.endsWith(".yaml") ||
        p.getFileName.toString.endsWith(".yml"))
      .sortBy(_.getFileName.toString)
      .map { p =>
        val name = p.getFileName.toString.replaceAll("\\.ya?ml$", "")
        name -> parseConfig(Files.readString(p))
      }

  /** Run every config in one SparkSession: prepare + evaluate per config,
    * tagged with its experiment name — the multi-experiment driver loop as
    * ONE union'd DataFrame (each experiment stays an independent lazy DAG;
    * nothing materializes until the caller consumes the union).
    */
  def runAll(meta: org.apache.spark.sql.DataFrame,
             tileScores: org.apache.spark.sql.DataFrame,
             configs: Seq[(String, Experiment.Config)]): org.apache.spark.sql.DataFrame = {
    require(configs.nonEmpty, "runAll: no configs")
    configs.map { case (name, cfg) =>
      Experiment.evaluate(Experiment.prepare(meta, cfg), tileScores, cfg)
        .withColumn("experiment", org.apache.spark.sql.functions.lit(name))
    }.reduce(_ unionByName _)
  }
}
