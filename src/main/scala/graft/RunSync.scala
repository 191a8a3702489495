package graft

import scala.io.Source

import org.apache.spark.sql.SparkSession

import graft.sync.SyncEngine

/**
 * Product entry point: sync tables between formats from a YAML config —
 * the reference's CLI loop (ref `utilities/.../RunSync.java:104-177`).
 *
 * Config shape (a subset of the reference's):
 * {{{
 * sourceFormat: delta
 * targetFormats:
 *   - iceberg
 *   - hudi
 * datasets:
 *   - sourcePath: /data/tables/orders
 *     targetPathPrefix: /data/out/orders      # optional
 * }}}
 *
 * Usage: `runMain graft.RunSync --config sync.yaml [--mode auto|full|incremental]`
 *
 * Each (dataset × targetFormat) runs an independent sync with failure
 * isolation: one failing target doesn't stop the rest (ref
 * `TableFormatSync.java:93-175`), and the exit code reflects whether
 * any failed.
 */
object RunSync {

  final case class Config(
      sourceFormat: String,
      targetFormats: Seq[String],
      datasets: Seq[Dataset])
  final case class Dataset(sourcePath: String, targetPathPrefix: Option[String])

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList, Map.empty)
    val configPath = opts.getOrElse("config",
      sys.error("usage: RunSync --config <file.yaml> [--mode auto|full|incremental]"))
    val mode = opts.getOrElse("mode", "auto") match {
      case "auto"        => SyncEngine.Auto
      case "full"        => SyncEngine.Full
      case "incremental" => SyncEngine.Incremental
      case other         => sys.error(s"unknown mode: $other")
    }
    val config = parseConfig(readFile(configPath))
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    val failures = run(spark, config, mode)
    spark.stop()
    if (failures > 0) sys.exit(1)
  }

  /** Runs every (dataset × target) sync; returns the failure count. */
  def run(spark: SparkSession, config: Config, mode: SyncEngine.Mode): Int = {
    var failures = 0
    for (ds <- config.datasets; targetFormat <- config.targetFormats) {
      val targetPath =
        s"${ds.targetPathPrefix.getOrElse(ds.sourcePath.stripSuffix("/"))}_$targetFormat"
      try {
        val source = SyncEngine.sourceFor(spark, config.sourceFormat, ds.sourcePath)
        val target = SyncEngine.targetFor(spark, targetFormat, targetPath)
        val res = SyncEngine.sync(source, target, mode)
        println(s"SYNC OK ${config.sourceFormat}:${ds.sourcePath} -> $targetFormat:$targetPath " +
          s"mode=${res.mode} versions=${res.versionsSynced.mkString(",")} " +
          s"added=${res.filesAdded} removed=${res.filesRemoved}")
      } catch {
        case e: Exception =>
          failures += 1
          println(s"SYNC FAILED ${config.sourceFormat}:${ds.sourcePath} -> " +
            s"$targetFormat:$targetPath: ${e.getMessage}")
      }
    }
    failures
  }

  @annotation.tailrec
  private def parseArgs(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case key :: value :: rest if key.startsWith("--") =>
        parseArgs(rest, acc + (key.stripPrefix("--") -> value))
      case Nil => acc
      case other => sys.error(s"unexpected arguments: $other")
    }

  private def readFile(path: String): String = {
    val src = Source.fromFile(path)
    try src.mkString finally src.close()
  }

  /** Minimal YAML-subset parser for the config shape above: top-level
    * scalars, string lists, and one level of list-of-maps. */
  def parseConfig(yaml: String): Config = {
    val lines = yaml.linesIterator
      // comments start a line or follow whitespace — a '#' inside a
      // value (object-store keys, '/data/tbl#v2') is data
      .map(_.replaceAll("(^|\\s)#.*$", "$1"))
      .filter(_.trim.nonEmpty)
      .toList
    var sourceFormat = ""
    var targetFormats = Vector.empty[String]
    var datasets = Vector.empty[Map[String, String]]
    var section = ""
    for (line <- lines) {
      val indent = line.takeWhile(_ == ' ').length
      val t = line.trim
      (indent, t) match {
        case (0, s"sourceFormat:$v")  => sourceFormat = v.trim; section = ""
        case (0, "targetFormats:")    => section = "targetFormats"
        case (0, "datasets:")         => section = "datasets"
        case (_, item) if item.startsWith("- ") && section == "targetFormats" =>
          targetFormats :+= item.stripPrefix("- ").trim
        case (_, item) if item.startsWith("- ") && section == "datasets" =>
          // new dataset entry; the first key may ride the dash line
          datasets :+= Map.empty
          item.stripPrefix("- ").split(":", 2) match {
            case Array(k, v) if v.trim.nonEmpty =>
              datasets = datasets.init :+ (datasets.last + (k.trim -> v.trim))
            case _ =>
          }
        case (i, kv) if i > 0 && section == "datasets" && datasets.nonEmpty =>
          kv.split(":", 2) match {
            case Array(k, v) => datasets = datasets.init :+ (datasets.last + (k.trim -> v.trim))
            case _ =>
          }
        case _ =>
          throw new IllegalArgumentException(s"cannot parse config line: $line")
      }
    }
    require(sourceFormat.nonEmpty, "config missing sourceFormat")
    require(targetFormats.nonEmpty, "config missing targetFormats")
    require(datasets.nonEmpty, "config missing datasets")
    Config(sourceFormat, targetFormats,
      datasets.map(m => Dataset(
        m.getOrElse("sourcePath", sys.error("dataset missing sourcePath")),
        m.get("targetPathPrefix"))))
  }
}
