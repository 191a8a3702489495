package graft

import scala.io.Source

import org.apache.spark.sql.SparkSession

import graft.sync.SyncEngine

/**
 * Product entry point: sync tables between formats from a YAML config —
 * the reference's CLI loop (ref `utilities/.../RunSync.java:104-177`).
 *
 * Config shape (the reference's `DatasetConfig` + catalog + client
 * registry, ref `RunSync.java:226-270`, `IcebergCatalogConfig.java`,
 * `onetable-client-defaults.yaml`):
 * {{{
 * sourceFormat: delta
 * targetFormats:
 *   - iceberg
 *   - hudi
 * catalog:                                 # optional named-table root
 *   name: graft
 *   warehouse: /data/warehouse             # tables at <warehouse>/<ns>/<name>_<fmt>
 *   impl: com.corp.MyCatalog               # optional GraftCatalog plug-in;
 *                                          #   extra keys pass to its ctor
 * clients:                                 # optional per-format config,
 *   iceberg:                               # persisted as target table
 *     commit.retry.num-retries: "4"        # properties (ref ClientConfig
 *   hudi:                                  #   .configuration)
 *     hoodie.keep.max.commits: "40"
 * datasets:
 *   - sourcePath: /data/tables/orders      # alias: tableBasePath
 *     targetPathPrefix: /data/out/orders   # optional explicit target
 *   - sourcePath: /data/tables/events
 *     tableName: events                    # named table → catalog layout
 *     namespace: analytics.prod
 *     partitionSpec: ts:MONTH              # source spec override (ref
 * }}}                                      #   HudiSourceConfig)
 *
 * Usage: `runMain graft.RunSync --config sync.yaml [--mode auto|full|incremental]
 *         [--continuous <seconds> [--max-cycles N]]`
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
      datasets: Seq[Dataset],
      catalog: Option[Catalog] = None,
      clients: Map[String, Map[String, String]] = Map.empty)
  final case class Dataset(
      sourcePath: String,
      targetPathPrefix: Option[String] = None,
      tableName: Option[String] = None,
      namespace: Option[String] = None,
      partitionSpec: Option[String] = None)
  /** The YAML `catalog:` section. `impl` names a [[graft.sync.GraftCatalog]]
    * class to reflection-load (the reference's `catalogImpl` seam, ref
    * `RunSync.java:136-140`, `IcebergCatalogConfig.java`); absent, the
    * path-rooted [[graft.sync.WarehouseCatalog]] resolves names under
    * `warehouse`. `extra` keys pass to the impl's constructor verbatim. */
  final case class Catalog(
      name: String,
      warehouse: String,
      impl: Option[String] = None,
      extra: Map[String, String] = Map.empty) {
    lazy val resolved: graft.sync.GraftCatalog = graft.sync.GraftCatalog.load(
      extra ++
        Map("name" -> name, "warehouse" -> warehouse).filter(_._2.nonEmpty) ++
        impl.map("impl" -> _))
  }

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
    val failures = opts.get("continuous") match {
      case Some(interval) =>
        // continuous mode: the reference's post-commit-hook / scheduled
        // sync shape (ref `OneTableSyncTool.java:46-80`) as a polling
        // daemon; idle cycles commit nothing (watermark short-circuit)
        runContinuous(spark, config, mode,
          intervalMs = (interval.toDouble * 1000).toLong,
          maxCycles = opts.get("max-cycles").map(_.toInt).getOrElse(Int.MaxValue))
      case None => run(spark, config, mode)
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }

  /** Polls `run` every `intervalMs` for `maxCycles` cycles; returns the
    * last cycle's failure count. `onCycle` is a test seam invoked after
    * each cycle with its index. */
  def runContinuous(
      spark: SparkSession,
      config: Config,
      mode: SyncEngine.Mode,
      intervalMs: Long,
      maxCycles: Int,
      onCycle: Int => Unit = _ => ()): Int = {
    var failures = 0
    var cycle = 0
    while (cycle < maxCycles) {
      failures = run(spark, config, mode)
      onCycle(cycle)
      cycle += 1
      if (cycle < maxCycles) Thread.sleep(intervalMs)
    }
    failures
  }

  /** Target location for one (dataset, format): explicit prefix first,
    * then catalog layout `<warehouse>/<namespace>/<tableName>_<fmt>`,
    * else sibling-of-source (ref table-identifier resolution
    * `RunSync.java:150-166`). */
  def targetPathFor(config: Config, ds: Dataset, targetFormat: String): String =
    (ds.targetPathPrefix, ds.tableName, config.catalog) match {
      case (Some(p), _, _) => s"${p}_$targetFormat"
      case (None, Some(name), Some(cat)) =>
        cat.resolved.locate(ds.namespace, name, targetFormat)
      case _ => s"${sourcePathFor(config, ds).stripSuffix("/")}_$targetFormat"
    }

  /** Source location: an explicit `sourcePath` wins; a named dataset
    * with no path resolves through the catalog under the SOURCE format
    * — both ends of a sync can be catalog identities, the reference's
    * table-identifier shape (ref `RunSync.java:150-166`). */
  def sourcePathFor(config: Config, ds: Dataset): String =
    if (ds.sourcePath.nonEmpty) ds.sourcePath
    else (ds.tableName, config.catalog) match {
      case (Some(name), Some(cat)) =>
        cat.resolved.locate(ds.namespace, name, config.sourceFormat)
      case _ => sys.error(
        s"dataset ${ds.tableName.getOrElse("?")} has no sourcePath and no catalog to resolve it")
    }

  /** Runs every (dataset × target) sync; returns the failure count. */
  def run(spark: SparkSession, config: Config, mode: SyncEngine.Mode): Int = {
    var failures = 0
    for (ds <- config.datasets; targetFormat <- config.targetFormats) {
      val targetPath = targetPathFor(config, ds, targetFormat)
      val sourcePath = sourcePathFor(config, ds)
      try {
        val source = SyncEngine.sourceFor(spark, config.sourceFormat, sourcePath,
          ds.partitionSpec.map(_.split("[;,]").toSeq.map(_.trim).filter(_.nonEmpty)))
        val target = SyncEngine.targetFor(spark, targetFormat, targetPath)
        // the client registry's per-format configuration plus the
        // catalog identity persist as target table properties
        val identity = (config.catalog, ds.tableName) match {
          case (Some(cat), Some(name)) => Map(
            "graft.catalog.name" -> cat.resolved.name,
            "graft.catalog.table" -> (ds.namespace.map(_ + ".").getOrElse("") + name))
          case _ => Map.empty[String, String]
        }
        val props = config.clients.getOrElse(targetFormat, Map.empty) ++ identity
        val res = SyncEngine.sync(source, target, mode, props)
        println(s"SYNC OK ${config.sourceFormat}:$sourcePath -> $targetFormat:$targetPath " +
          s"mode=${res.mode} versions=${res.versionsSynced.mkString(",")} " +
          s"added=${res.filesAdded} removed=${res.filesRemoved}")
      } catch {
        case e: Exception =>
          failures += 1
          println(s"SYNC FAILED ${config.sourceFormat}:$sourcePath -> " +
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
    * scalars, string lists, one level of list-of-maps (`datasets`), a
    * scalar map (`catalog`), and a two-level map (`clients`). */
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
    var catalog = Map.empty[String, String]
    var clients = Vector.empty[(String, Map[String, String])]
    var section = ""
    var clientIndent = -1
    for (line <- lines) {
      val indent = line.takeWhile(_ == ' ').length
      val t = line.trim
      (indent, t) match {
        case (0, s"sourceFormat:$v")  => sourceFormat = v.trim; section = ""
        case (0, "targetFormats:")    => section = "targetFormats"
        case (0, "datasets:")         => section = "datasets"
        case (0, "catalog:")          => section = "catalog"
        case (0, "clients:")          => section = "clients"; clientIndent = -1
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
        case (i, kv) if i > 0 && section == "catalog" =>
          kv.split(":", 2) match {
            case Array(k, v) => catalog += (k.trim -> v.trim)
            case _ => throw new IllegalArgumentException(s"cannot parse catalog line: $line")
          }
        case (i, kv) if i > 0 && section == "clients" =>
          // first indent level names a format; deeper lines are its config
          kv.split(":", 2) match {
            case Array(k, v) if v.trim.isEmpty && (clientIndent < 0 || i <= clientIndent) =>
              clientIndent = i
              clients :+= (k.trim.toLowerCase -> Map.empty)
            case Array(k, v) if clients.nonEmpty && i > clientIndent =>
              clients = clients.init :+
                (clients.last._1 -> (clients.last._2 + (k.trim -> unquote(v.trim))))
            case _ => throw new IllegalArgumentException(s"cannot parse clients line: $line")
          }
        case _ =>
          throw new IllegalArgumentException(s"cannot parse config line: $line")
      }
    }
    require(sourceFormat.nonEmpty, "config missing sourceFormat")
    require(targetFormats.nonEmpty, "config missing targetFormats")
    require(datasets.nonEmpty, "config missing datasets")
    val cat = (catalog.get("name"), catalog.get("warehouse"), catalog.get("impl")) match {
      case (Some(n), Some(w), impl) =>
        Some(Catalog(n, w, impl, catalog -- Seq("name", "warehouse", "impl")))
      case (n, w, Some(impl)) =>
        // a custom impl defines its own config vocabulary — name and
        // warehouse are optional and it validates what it needs
        Some(Catalog(n.getOrElse(""), w.getOrElse(""), Some(impl),
          catalog -- Seq("name", "warehouse", "impl")))
      case (None, None, None) => None
      case _ => throw new IllegalArgumentException(
        "catalog section needs both `name` and `warehouse` (or an `impl`)")
    }
    Config(sourceFormat, targetFormats,
      datasets.map(m => Dataset(
        m.get("sourcePath").orElse(m.get("tableBasePath")).getOrElse {
          // a named dataset may omit the path and resolve it through
          // the catalog at run time (see sourcePathFor)
          require(m.contains("tableName") && cat.nonEmpty,
            "dataset missing sourcePath/tableBasePath (or tableName + catalog)")
          ""
        },
        m.get("targetPathPrefix"),
        m.get("tableName"),
        m.get("namespace"),
        m.get("partitionSpec"))),
      cat,
      clients.toMap)
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
