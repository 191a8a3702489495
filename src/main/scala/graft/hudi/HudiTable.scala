package graft.hudi

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.AvroSchemaConverters
import graft.stats.ParquetFooterStats
import graft.util.StagedWrites

/**
 * Native Hudi COW table — the third format plane (ref
 * `core/.../hudi/HudiDataFileExtractor.java:113-256` reads the timeline
 * through Hudi's FS view on the driver; here replay is a distributed
 * DataFrame job over the commit metadata files, the same shape as our
 * Delta log replay so a 10^5-commit timeline plans on executors).
 *
 * Snapshot semantics (COW): a file group is (partitionPath, fileId);
 * the live base file of a group is the one written by the latest
 * commit ≤ asOf, unless a replacecommit ≤ asOf replaced the group later
 * (clustering/insert-overwrite — ref `HudiDataFileExtractor.java:313-348`).
 * CLEAN/ROLLBACK/SAVEPOINT are no-ops for the COW read-optimized view
 * (ref `:244-250`).
 *
 * Schema travels in each commit's `extraMetadata` as an Avro schema
 * (Hudi convention), through [[graft.schema.AvroSchemaConverters]] —
 * the reference's Avro↔canonical hop (`core/.../avro/AvroSchemaConverter.java`).
 * Partition fields live in `hoodie.properties`.
 */
final class HudiTable private (spark: SparkSession, val timeline: HudiTimeline) {

  def tablePath: String = timeline.tablePath

  // ---------------------------------------------------------------- reads

  /** Completed data instants, time-ordered. */
  def instants: Seq[String] = timeline.completedInstants().map(_.time)

  def latestInstant: String = instants.lastOption.getOrElse(
    throw new IllegalStateException(s"empty hudi table: $tablePath"))

  /** Latest completed instant whose UTC wall-clock time is <= tsMillis. */
  def instantForTimestamp(tsMillis: Long): String = {
    val c = instants.filter(i => HudiTimeline.parseInstant(i).toEpochMilli <= tsMillis)
    require(c.nonEmpty, s"no hudi instant at or before $tsMillis")
    c.last
  }

  def properties: Map[String, String] = timeline.readProperties()

  def partitionColumns: Seq[String] =
    properties.get("hoodie.table.partition.fields").filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(Seq.empty)

  /** Table schema at an instant: Avro schema from the latest commit's
    * extraMetadata (Hudi's schema-evolution channel). */
  def schemaAt(asOf: Option[String] = None): StructType = {
    val upTo = asOf.map(a => instants.filter(_ <= a)).getOrElse(instants)
    require(upTo.nonEmpty, s"no commit at or before ${asOf.getOrElse("?")} in $tablePath")
    val completed = timeline.completedInstants().filter(i => upTo.contains(i.time))
    // newest-to-oldest until a commit carries a schema
    completed.reverse.iterator
      .map(i => timeline.readCommitMetadata(i).extraMetadata.get("schema"))
      .collectFirst { case Some(avroJson) =>
        AvroSchemaConverters.fromAvro(new org.apache.avro.Schema.Parser().parse(avroJson))
      }
      .getOrElse(throw new IllegalStateException(s"no schema in timeline of $tablePath"))
  }

  private def hconf = spark.sparkContext.hadoopConfiguration

  /** Spark parse schema for commit metadata JSON (distributed replay). */
  private val commitSchema = StructType(Seq(
    StructField("partitionToWriteStats", MapType(StringType, ArrayType(StructType(Seq(
      StructField("fileId", StringType),
      StructField("path", StringType),
      StructField("fileSizeInBytes", LongType),
      StructField("numWrites", LongType)))))),
    StructField("partitionToReplaceFileIds", MapType(StringType, ArrayType(StringType)))))

  /** Raw per-commit adds/replaces for instants in (from, to] (or all ≤ to)
    * as a DataFrame — the distributed replay input. */
  private def actionsDF(instantTimes: Seq[String]): DataFrame = {
    require(instantTimes.nonEmpty, s"no instants selected on $tablePath")
    val byTime = timeline.completedInstants().map(i => i.time -> i).toMap
    val paths = instantTimes.map(t => timeline.existingInstantFile(byTime(t)).toString)
    val raw = spark.read.option("wholetext", "true").text(paths: _*)
      .withColumn("instant",
        regexp_extract(input_file_name(), "(\\d{14,17})\\.(commit|replacecommit)$", 1))
      .withColumn("meta", from_json(col("value"), commitSchema))
    val adds = raw
      .select(col("instant"),
        explode(col("meta.partitionToWriteStats")).as(Seq("partitionPath", "stats")))
      .select(col("instant"), col("partitionPath"), explode(col("stats")).as("st"))
      .select(col("instant"), col("partitionPath"),
        col("st.fileId").as("fileId"), col("st.path").as("path"),
        col("st.fileSizeInBytes").as("size"), lit(true).as("isAdd"))
    val replaces = raw
      .filter(col("meta.partitionToReplaceFileIds").isNotNull)
      .select(col("instant"),
        explode(col("meta.partitionToReplaceFileIds")).as(Seq("partitionPath", "ids")))
      .select(col("instant"), col("partitionPath"), explode(col("ids")).as("fileId"),
        lit(null).cast(StringType).as("path"), lit(null).cast(LongType).as("size"),
        lit(false).as("isAdd"))
    adds.unionByName(replaces)
  }

  /**
   * Live base files at `asOf`: per file group the newest action wins;
   * the group is live iff that action is a write (not a replace). One
   * shuffle on (partitionPath, fileId), no driver-side state.
   */
  def fileSlicesDF(asOf: Option[String] = None): DataFrame = {
    val upTo = asOf.map(a => instants.filter(_ <= a)).getOrElse(instants)
    val w = Window.partitionBy(col("partitionPath"), col("fileId"))
      .orderBy(col("instant").desc)
    actionsDF(upTo)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("isAdd"))
      .drop("rn", "isAdd")
  }

  def scan: HudiScanBuilder = new HudiScanBuilder(spark, this, None)
  def scanAsOf(instant: String): HudiScanBuilder = new HudiScanBuilder(spark, this, Some(instant))

  def toDF(asOf: Option[String] = None): DataFrame =
    (asOf match {
      case Some(i) => scanAsOf(i)
      case None    => scan
    }).toDF()

  /** Rows added by commits in (fromExclusive, toInclusive] — the
    * incremental change feed (ref `HudiDataFileExtractor.java:126-256`
    * per-instant add sets; COW inserts only here). */
  def changesAsDF(fromExclusive: String, toInclusive: String): DataFrame = {
    val range = instants.filter(t => t > fromExclusive && t <= toInclusive)
    require(range.nonEmpty, s"no instants in ($fromExclusive, $toInclusive] of $tablePath")
    val added = actionsDF(range)
      .filter(col("isAdd"))
      .select("path", "partitionPath", "size").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
    readFiles(added, Some(toInclusive))
  }

  /** Base dir partition directories resolve against (source dir for
    * metadata-only converted tables). */
  private[hudi] def readBasePath: String =
    properties.getOrElse("graft.converted.from", tablePath)

  /** (path, partitionPath, size) triples → DataFrame through a
    * [[graft.sources.ManifestFileIndex]]: sizes and partition values
    * come from the timeline, no filesystem listing/stat-ing. */
  private[hudi] def readFiles(
      files: Seq[(String, String, Long)], asOf: Option[String]): DataFrame = {
    val schema = schemaAt(asOf)
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val manifest = files.map { case (f, pp, size) =>
      graft.sources.ManifestFile(
        path = if (f.startsWith("/") || f.contains(":/")) f else new Path(tablePath, f).toString,
        size = size,
        modificationTime = 0L,
        partitionValues = HudiTable.parsePartitionPath(pp))
    }
    graft.sources.ManifestFileIndex.read(
      spark, readBasePath, manifest, schema, partitionColumns)
  }

  // ---------------------------------------------------------------- writes

  /** Append via a commit instant. Returns the instant time.
    * `commitProps` ride the commit's extraMetadata atomically
    * (streaming sink batch tracking; same channel as sync watermarks,
    * ref `HudiTargetClient.java:546-551`). */
  def append(df: DataFrame, partCols: Seq[String] = Seq.empty,
      commitProps: Map[String, String] = Map.empty): String =
    write(df, partCols, overwrite = false, commitProps = commitProps)

  /** Logical overwrite via a replacecommit: new file groups written, all
    * previously-live groups recorded as replaced (ref insert-overwrite
    * path `HudiDataFileExtractor.java:313-348`); old base files stay on
    * disk so time travel keeps working. */
  def overwrite(df: DataFrame, partCols: Seq[String] = Seq.empty,
      commitProps: Map[String, String] = Map.empty): String =
    write(df, partCols, overwrite = true, commitProps = commitProps)

  /** Read side of `commitProps`: latest value across completed
    * commits, newest-first. */
  def lastCommitProp(key: String): Option[String] =
    timeline.completedInstants()
      .filter(i => i.action == "commit" || i.action == "replacecommit")
      .reverseIterator
      .flatMap(i => timeline.readCommitMetadata(i).extraMetadata.get(key))
      .nextOption()

  /**
   * Bin-packing small-file compaction — Hudi's clustering shape, a
   * `replacecommit` (operation CLUSTER) replacing the compacted file
   * groups with consolidated ones (ref REPLACE_COMMIT clustering diff,
   * `core/.../hudi/HudiDataFileExtractor.java:313-348`). Partitions
   * with ≥2 base files under `smallFileBytes` are rewritten into
   * ~`targetFileBytes` outputs; `sortBy` range-clusters the rewrite.
   * Returns the replacecommit instant, or None when nothing qualifies.
   */
  def compact(
      targetFileBytes: Long = 128L << 20,
      smallFileBytes: Long = 32L << 20,
      sortBy: Seq[String] = Seq.empty,
      /** Morton-interleave these columns for multi-dim skipping
        * (graft.util.ZOrder); takes precedence over sortBy. */
      zorderBy: Seq[String] = Seq.empty): Option[String] = {
    val rows = fileSlicesDF(None).select("path", "partitionPath", "size").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
    val smalls = rows.groupBy(_._2).values.flatMap { g =>
      val s = g.filter(_._3 < smallFileBytes)
      if (s.size >= 2) s else Seq.empty
    }.toSeq
    if (smalls.isEmpty) return None
    val df = readFiles(smalls, None)
    val n = math.max(1, math.ceil(smalls.map(_._3).sum.toDouble / targetFileBytes).toInt)
    val arranged =
      if (zorderBy.nonEmpty) graft.util.ZOrder.arrange(df, zorderBy, n)
      else if (sortBy.nonEmpty)
        df.repartitionByRange(n, sortBy.map(col): _*).sortWithinPartitions(sortBy.map(col): _*)
      else if (partitionColumns.nonEmpty) df.repartition(n, partitionColumns.map(col): _*)
      else df.repartition(n)
    Some(write(arranged, Seq.empty, overwrite = false,
      replacing = smalls.map(f => absoluteOf(f._1))))
  }

  private def write(
      df: DataFrame,
      partSpecsIn: Seq[String],
      overwrite: Boolean,
      /** Base-file paths whose file groups this commit replaces. */
      replacing: Seq[String] = Seq.empty,
      commitProps: Map[String, String] = Map.empty): String = {
    // same spec handling as the Delta/Iceberg write paths: parse
    // identity/transform specs, inherit the table's fields when the
    // caller passes none, and REJECT a mismatching explicit spec
    // (was: silently ignored on append)
    val defs = {
      val parsed = graft.model.PartitionTransform.parseAll(partSpecsIn)
      if (instants.isEmpty) parsed
      else if (parsed.isEmpty)
        // inherit from the RECORDED specs (written at create time) — a
        // name-pattern heuristic would misfire on identity columns that
        // happen to be called `<x>_month`
        properties.get(HudiTable.PartitionSpecsProp) match {
          case Some(specs) => graft.model.PartitionTransform.parseAll(
            specs.split(";").toSeq.filter(_.nonEmpty))
          case None => partitionColumns.map(graft.model.PartitionFieldDef(_, "identity"))
        }
      else {
        require(parsed.map(_.fieldName) == partitionColumns,
          s"partition spec $partSpecsIn != table fields $partitionColumns of $tablePath")
        parsed
      }
    }
    defs.foreach(d => require(d.isIdentity || d.isTime,
      s"partition transform '${d.transform}' is Iceberg-only; Hudi partition " +
        "specs support identity and year/month/day/hour"))
    val genDefs = defs.filterNot(_.isIdentity)
    val partCols = defs.map(_.fieldName)
    val dfWithGen = genDefs.foldLeft(df)((d, t) =>
      d.withColumn(t.fieldName, graft.model.PartitionTransform.valueExpr(t)))
    val instant = timeline.nextInstantTime()
    val placed = StagedWrites.writeAndPlace(dfWithGen, tablePath, partCols)
    val fs = new Path(tablePath).getFileSystem(hconf)
    // rename to the Hudi base-file convention <fileId>_<writeToken>_<instant>.parquet
    val renamed = placed.map { p =>
      val src = new Path(p)
      val fileId = UUID.randomUUID().toString
      val dest = new Path(src.getParent, s"${fileId}_0-0-0_$instant.parquet")
      require(fs.rename(src, dest), s"failed to finalize $src")
      (fileId, dest.toString)
    }
    val idByPath = renamed.map(_.swap).toMap
    val stats = ParquetFooterStats.collect(spark, renamed.map(_._2))
    val base = new Path(tablePath).toUri.getPath.stripSuffix("/") + "/"
    val writeStats = stats.map { st =>
      val rel = new Path(st.path).toUri.getPath.stripPrefix(base)
      val partitionPath = rel.split("/").dropRight(1).mkString("/")
      partitionPath -> HudiWriteStat(
        fileId = idByPath(st.path),
        path = rel,
        prevCommit = instants.lastOption.getOrElse("null"),
        numWrites = st.recordCount,
        fileSizeInBytes = st.fileSizeBytes)
    }
    // col_stats index entry for this commit (ref
    // `BaseFileUpdatesExtractor.java:234-262` — every write stat carries
    // its column ranges); written before the commit so a visible instant
    // always has its index, and an orphan from a failed commit is
    // unreachable (readers resolve index files through the timeline)
    HudiColStats.write(spark, tablePath, instant, stats.map { st =>
      val rel = new Path(st.path).toUri.getPath.stripPrefix(base)
      (rel.split("/").dropRight(1).mkString("/"), new Path(st.path).getName, st.columns)
    })
    val replaceIds: Map[String, Seq[String]] =
      if (overwrite && instants.nonEmpty)
        fileSlicesDF(None).select("partitionPath", "fileId").collect().toSeq
          .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
      else if (replacing.nonEmpty && instants.nonEmpty) {
        val rs = replacing.map(HudiTable.normalize).toSet
        fileSlicesDF(None).select("partitionPath", "fileId", "path").collect().toSeq
          .filter(r => rs.contains(HudiTable.normalize(absoluteOf(r.getString(2)))))
          .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
      } else Map.empty
    if (instants.isEmpty)
      timeline.writeProperties(HudiTable.tableProperties(tablePath, partCols,
        if (genDefs.isEmpty) Map.empty
        else Map(HudiTable.PartitionSpecsProp -> defs.map(_.spec).mkString(";"))))
    // additive schema evolution, same contract as the Delta path: a
    // narrower append never drops existing columns, type changes are
    // rejected, new columns join at the end
    val storedSchema =
      if (instants.isEmpty) dfWithGen.schema
      else HudiTable.mergeSchemas(schemaAt(None), dfWithGen.schema, tablePath)
    val meta = HudiCommitMetadata(
      partitionToWriteStats = writeStats.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap,
      partitionToReplaceFileIds = replaceIds,
      // partition fields (incl. materialized transforms) are part of the
      // Hudi table schema, matching the hive-style layout convention
      extraMetadata = Map("schema" -> AvroSchemaConverters.toAvro(storedSchema).toString)
        ++ commitProps,
      operationType =
        if (overwrite) "INSERT_OVERWRITE_TABLE"
        else if (replacing.nonEmpty) "CLUSTER"
        else "INSERT")
    val action = if (replaceIds.nonEmpty) "replacecommit" else "commit"
    require(timeline.commit(HudiInstant(instant, action), meta),
      s"concurrent hudi commit at $instant of $tablePath")
    instant
  }

  // ---------------------------------------------------------- maintenance

  /**
   * Roll back the latest completed data instant: delete the base files
   * it wrote (managed files only — externally-referenced files belong
   * to their source), revoke the instant from the timeline, and record
   * a `.rollback` instant listing the deleted files so the incremental
   * change feed can replay the removals (ref
   * `core/.../hudi/HudiDataFileExtractor.java:207-223`). Snapshot reads
   * need no special handling: the revoked instant simply no longer
   * replays. Returns the rollback instant time.
   */
  def rollback(): String = {
    val target = timeline.completedInstants().lastOption.getOrElse(
      throw new IllegalStateException(s"nothing to roll back on $tablePath"))
    val rollbackTime = timeline.nextInstantTime()
    val meta = rollbackOne(target)
    require(timeline.commitJson(HudiInstant(rollbackTime, "rollback"),
      HudiMaintenanceCodec.rollbackToJson(rollbackTime, meta)),
      s"concurrent hudi commit at $rollbackTime of $tablePath")
    rollbackTime
  }

  /**
   * Restore the table to `toInstant`: roll back every data instant
   * after it (newest first), recorded as one `.restore` instant whose
   * metadata nests the per-commit rollback info — the change feed
   * flattens all of it into removals (ref
   * `core/.../hudi/HudiDataFileExtractor.java:224-243`).
   */
  def restoreTo(toInstant: String): String = {
    require(instants.contains(toInstant), s"no instant $toInstant on $tablePath")
    val doomed = instants.filter(_ > toInstant).reverse
      .map(t => timeline.completedInstants().find(_.time == t).get)
    val restoreTime = timeline.nextInstantTime()
    val rollbacks = doomed.map(rollbackOne)
    require(timeline.commitJson(HudiInstant(restoreTime, "restore"),
      HudiMaintenanceCodec.restoreToJson(restoreTime,
        HudiRestoreMetadata(toInstant, doomed.map(_.time), rollbacks))),
      s"concurrent hudi commit at $restoreTime of $tablePath")
    restoreTime
  }

  /** Revoke one completed data instant; returns what was deleted. */
  private def rollbackOne(target: HudiInstant): HudiRollbackMetadata = {
    val meta = timeline.readCommitMetadata(target)
    val fs = new Path(tablePath).getFileSystem(hconf)
    val baseUriPath = new Path(tablePath).toUri.getPath.stripSuffix("/") + "/"
    val byPartition = meta.partitionToWriteStats.map { case (pp, stats) =>
      pp -> stats.map(ws => absoluteOf(ws.path))
    }
    byPartition.valuesIterator.flatten.foreach { p =>
      val path = new Path(p)
      if (path.toUri.getPath.startsWith(baseUriPath)) fs.delete(path, false)
    }
    timeline.deleteInstant(target)
    // the revoked instant's stats must not outlive it
    HudiColStats.delete(spark, tablePath, target.time)
    HudiRollbackMetadata(Seq(target.time), byPartition)
  }

  /** Expose archival for writer tables (the sync target archives
    * automatically, ref `HudiTargetClient.java:537-545`). */
  def archiveTimeline(): Int = {
    val props = properties
    timeline.archiveIfNeeded(
      props.get(HudiTable.MaxActiveInstantsProp).map(_.toInt)
        .getOrElse(HudiTable.DefaultMaxActiveInstants),
      props.get(HudiTable.MinActiveInstantsProp).map(_.toInt)
        .getOrElse(HudiTable.DefaultMinActiveInstants))
  }

  // ----------------------------------------------------------------- sync

  /** Root the data files live under (for cross-format sync targets). */
  def dataRoot: String = readBasePath

  /** Instants the incremental sync feed replays, time-ordered: data
    * commits plus rollback/restore (whose change sets are removals);
    * clean stays a feed no-op (ref `HudiDataFileExtractor.java:244-250`). */
  def syncInstants: Seq[String] =
    timeline.allCompletedInstants().filter(i => HudiTable.FeedActions(i.action)).map(_.time)

  /** Retention fence input: the earliest commit whose files the latest
    * clean still retains, if any clean has run (ref
    * `core/.../hudi/HudiClient.java:152-177`). */
  def earliestCommitToRetain: Option[String] =
    timeline.allCompletedInstants().filter(_.action == "clean").lastOption
      .map(i => HudiMaintenanceCodec.cleanFromJson(timeline.readInstantJson(i)))
      .map(_.earliestCommitToRetain).filter(_.nonEmpty)

  /** Extra metadata of the newest commit — where sync watermarks ride
    * (the reference persists sync state in commit extraMetadata, ref
    * `core/.../hudi/HudiTargetClient.java:367-402`). */
  def latestCommitExtraMetadata: Map[String, String] =
    timeline.latestInstant()
      .map(i => timeline.readCommitMetadata(i).extraMetadata)
      .getOrElse(Map.empty)

  /** Current snapshot as canonical data-file descriptors. Column bounds
    * come from the col_stats index when this table carries one (ref
    * `HudiFileStatsExtractor.java:96-103`: metadata table preferred,
    * footers otherwise); an index-less table — e.g. written by an engine
    * that didn't maintain stats — yields empty `columnStats`, and the
    * sync layer translates what exists rather than re-reading footers. */
  def snapshotDataFiles(): Seq[graft.model.InternalDataFile] = {
    val counts: Map[String, Long] = instants.flatMap { t =>
      val m = timeline.readCommitMetadata(
        timeline.completedInstants().find(_.time == t).get)
      m.partitionToWriteStats.valuesIterator.flatten.map(ws =>
        HudiTable.normalize(absoluteOf(ws.path)) -> ws.numWrites)
    }.toMap
    val statsByFile: Map[(String, String), Seq[graft.model.ColumnStatRow]] =
      HudiColStats.read(spark, tablePath, instants) match {
        case None => Map.empty
        case Some(df) => df.collect().toSeq
          .groupBy(r => (r.getString(0), r.getString(1)))
          .view.mapValues(_.map(r => graft.model.ColumnStatRow(
            column = r.getString(2),
            minValue = Option(r.getString(3)),
            maxValue = Option(r.getString(4)),
            numNulls = r.getLong(5),
            numValues = r.getLong(6),
            totalSize = r.getLong(7))).toSeq).toMap
      }
    fileSlicesDF(None).select("partitionPath", "path", "size").collect().toSeq.map { r =>
      val abs = absoluteOf(r.getString(1))
      graft.model.InternalDataFile(
        physicalPath = abs,
        partitionValues = HudiTable.parsePartitionPath(r.getString(0)),
        fileSizeBytes = if (r.isNullAt(2)) 0L else r.getLong(2),
        recordCount = counts.getOrElse(HudiTable.normalize(abs), -1L),
        columnStats = statsByFile.getOrElse(
          (r.getString(0), new Path(abs).getName), Seq.empty),
        lastModified = 0L)
    }
  }

  /** One instant's adds + removed paths — the incremental replay unit
    * (ref `HudiDataFileExtractor.java:126-256`). Rollback and restore
    * instants contribute pure removals: the files their metadata
    * records as deleted (ref `:207-243`); other non-data actions are
    * no-ops (ref `:244-250`). */
  def changeSet(instant: String): (Seq[graft.model.InternalDataFile], Seq[String]) = {
    val inst = timeline.allCompletedInstants().find(_.time == instant)
      .getOrElse(throw new IllegalArgumentException(s"no instant $instant on $tablePath"))
    inst.action match {
      case "commit" | "replacecommit" => // falls through to data replay below
      case "rollback" =>
        return (Seq.empty, HudiMaintenanceCodec
          .rollbackFromJson(timeline.readInstantJson(inst)).deletedFiles.map(absoluteOf))
      case "restore" =>
        return (Seq.empty, HudiMaintenanceCodec
          .restoreFromJson(timeline.readInstantJson(inst)).deletedFiles.map(absoluteOf))
      case _ =>
        return (Seq.empty, Seq.empty)
    }
    val meta = timeline.readCommitMetadata(inst)
    val adds = meta.partitionToWriteStats.toSeq.flatMap { case (pp, stats) =>
      stats.map(ws => graft.model.InternalDataFile(
        physicalPath = absoluteOf(ws.path),
        partitionValues = HudiTable.parsePartitionPath(pp),
        fileSizeBytes = ws.fileSizeInBytes,
        recordCount = ws.numWrites,
        columnStats = Seq.empty,
        lastModified = 0L))
    }
    val removed: Seq[String] =
      if (meta.partitionToReplaceFileIds.isEmpty) Seq.empty
      else {
        val prior = instants.filter(_ < instant)
        if (prior.isEmpty) Seq.empty
        else {
          val replaced = meta.partitionToReplaceFileIds.toSeq.flatMap {
            case (pp, ids) => ids.map(id => (pp, id))
          }.toSet
          fileSlicesDF(Some(prior.last))
            .select("partitionPath", "fileId", "path").collect().toSeq
            .filter(r => replaced.contains((r.getString(0), r.getString(1))))
            .map(r => absoluteOf(r.getString(2)))
        }
      }
    (adds, removed)
  }

  /**
   * Metadata-only sync commit: register externally-produced files (and
   * replaced groups) without touching data — the Hudi TARGET side of
   * the reference's loop (ref `core/.../hudi/HudiTargetClient.java:196-402`).
   * File groups are keyed deterministically by the source file name so
   * a later remove of the same path resolves to the same group.
   */
  def syncCommit(
      schema: StructType,
      partitionColumns: Seq[String],
      sourceDataRoot: String,
      adds: Seq[graft.model.InternalDataFile],
      removePaths: Seq[String],
      syncProps: Map[String, String]): String = {
    val instant = timeline.nextInstantTime()
    // partition specs may carry time transforms (`month(c)`); Hudi has
    // no transform concept, so the materialized field names become plain
    // partition-path segments with the canonical value strings
    val syncDefs = graft.model.PartitionTransform.parseAll(partitionColumns)
    val fieldNames = syncDefs.map(_.fieldName)
    if (!timeline.exists) {
      // record keys arriving through sync land in the native Hudi
      // convention (ref `HudiTargetClient.java` table-config wiring)
      val keyProps = syncProps.get("graft.record.key.fields")
        .map(ks => Map("hoodie.table.recordkey.fields" -> ks)).getOrElse(Map.empty)
      val specProps =
        if (syncDefs.forall(_.isIdentity)) Map.empty[String, String]
        else Map(HudiTable.PartitionSpecsProp -> syncDefs.map(_.spec).mkString(";"))
      timeline.writeProperties(HudiTable.tableProperties(
        tablePath, fieldNames,
        keyProps ++ specProps + ("graft.converted.from" -> sourceDataRoot)))
    }
    val writeStats = adds.map { f =>
      val pp = HudiTable.buildPartitionPath(f.partitionValues, fieldNames)
      pp -> HudiWriteStat(
        fileId = HudiTable.fileIdOf(f.physicalPath),
        path = new Path(f.physicalPath).toUri.toString,
        prevCommit = instants.lastOption.getOrElse("null"),
        numWrites = f.recordCount,
        fileSizeInBytes = f.fileSizeBytes)
    }
    val replaceIds: Map[String, Seq[String]] =
      if (removePaths.isEmpty || !timeline.exists || instants.isEmpty) Map.empty
      else {
        val removeSet = removePaths.map(HudiTable.normalize).toSet
        fileSlicesDF(None).select("partitionPath", "fileId", "path").collect().toSeq
          .filter(r => removeSet.contains(HudiTable.normalize(absoluteOf(r.getString(2)))))
          .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
      }
    // the stored schema must DECLARE every partition field the
    // properties reference — materialized transform fields from the
    // source become string columns here, so a later sync FROM this
    // table sees a self-consistent (schema, partition-fields) pair
    val schemaWithPartFields = StructType(
      schema.fields.map(_.copy(metadata = Metadata.empty)) ++
        fieldNames.filterNot(schema.fieldNames.contains)
          .map(StructField(_, StringType, nullable = true)))
    // the source's column ranges ride into the target's col_stats index
    // (ref `BaseFileUpdatesExtractor.java:240-262` — the extracted stats
    // are attached to each write stat so the target table keeps the
    // skipping index its native readers expect)
    HudiColStats.write(spark, tablePath, instant, adds
      .filter(_.columnStats.nonEmpty)
      .map(f => (HudiTable.buildPartitionPath(f.partitionValues, fieldNames),
        new Path(f.physicalPath).getName, f.columnStats)))
    val meta = HudiCommitMetadata(
      partitionToWriteStats = writeStats.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap,
      partitionToReplaceFileIds = replaceIds,
      extraMetadata = syncProps +
        ("schema" -> AvroSchemaConverters.toAvro(schemaWithPartFields).toString),
      operationType = if (replaceIds.nonEmpty) "INSERT_OVERWRITE" else "INSERT")
    val action = if (replaceIds.nonEmpty) "replacecommit" else "commit"
    require(timeline.commit(HudiInstant(instant, action), meta),
      s"concurrent hudi commit at $instant of $tablePath")
    // post-commit maintenance, mirroring the reference target loop (ref
    // `HudiTargetClient.java:414-545`): a synthetic CLEAN instant
    // records the files this sync removed so native Hudi readers learn
    // of removals from the timeline, then the active timeline is
    // archived down to its cap
    if (removePaths.nonEmpty && replaceIds.nonEmpty) {
      val cleanTime = timeline.nextInstantTime()
      val removedByPartition = removePaths
        .map(p => new Path(p).toUri.toString)
        .groupBy { p =>
          // recover the partition path from the removed file's dir
          // relative to the data root when possible, else flat
          val parent = new Path(p).getParent.toUri.getPath
          val root = new Path(sourceDataRoot).toUri.getPath.stripSuffix("/") + "/"
          if (parent.startsWith(root)) parent.stripPrefix(root).stripSuffix("/")
          else ""
        }
        .map { case (pp, ps) => pp -> ps.toSeq.sorted }
      // the fence must reflect what is still REPLAYABLE, and this clean
      // deletes no data files (the removed paths belong to the source's
      // history, which COW retains) — so every instant stays intact and
      // the fence sits at the oldest one. Advancing it to the current
      // instant would silently force every downstream incremental sync
      // to a full re-sync after each removal-bearing upstream sync.
      require(timeline.commitJson(HudiInstant(cleanTime, "clean"),
        HudiMaintenanceCodec.cleanToJson(cleanTime,
          HudiCleanMetadata(
            earliestCommitToRetain = instants.headOption.getOrElse(instant),
            partitionToDeleteFiles = removedByPartition))),
        s"concurrent hudi commit at $cleanTime of $tablePath")
    }
    archiveTimeline()
    instant
  }

  private def absoluteOf(p: String): String =
    if (p.startsWith("/") || p.contains(":/")) p else new Path(tablePath, p).toString
}

object HudiTable {

  def forPath(spark: SparkSession, tablePath: String): HudiTable =
    new HudiTable(spark, new HudiTimeline(tablePath, spark.sparkContext.hadoopConfiguration))

  def create(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      partitionColumns: Seq[String] = Seq.empty): HudiTable = {
    val t = forPath(spark, tablePath)
    require(!t.timeline.exists, s"table already exists: $tablePath")
    t.append(df, partitionColumns)
    t
  }

  private[hudi] def tableProperties(
      tablePath: String, partCols: Seq[String], extra: Map[String, String]): Map[String, String] =
    Map(
      "hoodie.table.name" -> new Path(tablePath).getName,
      "hoodie.table.type" -> "COPY_ON_WRITE",
      "hoodie.table.version" -> "6",
      "hoodie.timeline.layout.version" -> "1",
      "hoodie.table.base.file.format" -> "PARQUET",
      "hoodie.datasource.write.hive_style_partitioning" -> "true",
      "hoodie.table.partition.fields" -> partCols.mkString(",")) ++ extra

  /** Property recording the table's partition SPECS (incl. transforms)
    * so appends inherit them without name heuristics. */
  private[graft] val PartitionSpecsProp = "graft.partition.specs"

  /** Actions the incremental sync feed replays (clean excluded — ref
    * `HudiDataFileExtractor.java:244-250` treats it as a no-op). */
  private[graft] val FeedActions = Set("commit", "replacecommit", "rollback", "restore")

  /** Active-timeline archival caps (Hudi's `hoodie.keep.max.commits` /
    * `hoodie.keep.min.commits` defaults), overridable per table. */
  private[graft] val MaxActiveInstantsProp = "graft.timeline.max.active"
  private[graft] val MinActiveInstantsProp = "graft.timeline.min.active"
  private[graft] val DefaultMaxActiveInstants = 30
  private[graft] val DefaultMinActiveInstants = 20

  private[hudi] def mergeSchemas(
      existing: StructType, incoming: StructType, tablePath: String): StructType =
    graft.model.SchemaMerge.additive(existing, incoming, tablePath)

  /** Scheme-insensitive path form for set membership (file:/x vs /x). */
  private[graft] def normalize(p: String): String = new Path(p).toUri.getPath

  /** Hive `k=v` partition path → values (ref
    * `core/.../hudi/HudiPartitionValuesExtractor.java:47-173`). */
  private[graft] def parsePartitionPath(pp: String): Map[String, String] =
    if (pp == null || pp.isEmpty) Map.empty
    else pp.split("/").flatMap(_.split("=", 2) match {
      case Array(k, v) =>
        val d = graft.util.PathCodec.unescapePathName(v)
        Some(k -> (if (d == "__HIVE_DEFAULT_PARTITION__") null else d))
      case _ => None
    }).toMap

  private[graft] def buildPartitionPath(
      values: Map[String, String], partCols: Seq[String]): String =
    partCols.map { c =>
      val v = values.get(c).flatMap(Option(_)).getOrElse("__HIVE_DEFAULT_PARTITION__")
      s"$c=${graft.util.PathCodec.escapePathName(v)}"
    }.mkString("/")

  /** Deterministic file-group id for an externally-referenced file. */
  private[graft] def fileIdOf(absPath: String): String =
    new Path(absPath).getName.stripSuffix(".parquet")

  /**
   * Metadata-only conversion of an existing parquet dataset: the commit's
   * write stats point at the source files by absolute URI — no data
   * rewritten (the reference marks such files with an external-path
   * convention, ref `core/.../hudi/BaseFileUpdatesExtractor.java:206-238`).
   * File groups are keyed by the source file name; hive `k=v` dirs become
   * the partition path.
   */
  def convertFromParquet(
      spark: SparkSession,
      sourceLocation: String,
      tablePath: String): HudiTable = {
    val t = forPath(spark, tablePath)
    require(!t.timeline.exists, s"table already exists: $tablePath")
    val files = ParquetFooterStats.listParquetFiles(spark, sourceLocation)
    val schema = spark.read.parquet(sourceLocation).schema
    val srcBase = new Path(sourceLocation).toUri.getPath.stripSuffix("/") + "/"
    val relOf = (p: String) => new Path(p).toUri.getPath.stripPrefix(srcBase)
    val hiveKeys: Set[String] = files.headOption.map { f =>
      relOf(f).split("/").dropRight(1).flatMap(_.split("=", 2) match {
        case Array(k, _) if schema.fieldNames.contains(k) => Some(k)
        case _ => None
      }).toSet
    }.getOrElse(Set.empty)
    val partCols = schema.fieldNames.toSeq.filter(hiveKeys.contains)
    val instant = t.timeline.nextInstantTime()
    val stats = ParquetFooterStats.collect(spark, files)
    val writeStats = stats.map { st =>
      val rel = relOf(st.path)
      val partitionPath = rel.split("/").dropRight(1).mkString("/")
      partitionPath -> HudiWriteStat(
        fileId = new Path(st.path).getName.stripSuffix(".parquet"),
        path = new Path(st.path).toUri.toString,
        prevCommit = "null",
        numWrites = st.recordCount,
        fileSizeInBytes = st.fileSizeBytes)
    }
    t.timeline.writeProperties(tableProperties(
      tablePath, partCols, Map("graft.converted.from" -> sourceLocation)))
    val meta = HudiCommitMetadata(
      partitionToWriteStats = writeStats.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap,
      partitionToReplaceFileIds = Map.empty,
      extraMetadata = Map("schema" -> AvroSchemaConverters.toAvro(schema).toString),
      operationType = "BULK_INSERT")
    require(t.timeline.commit(HudiInstant(instant, "commit"), meta),
      s"table already exists: $tablePath")
    t
  }
}

/**
 * Scan with partition pruning evaluated distributed on the replayed
 * file-slice manifest (partitionPath parsed as hive `k=v` inside the
 * plan — no per-file driver work), mirroring the Delta/Iceberg scan
 * builders so all three formats prune at the same layer.
 */
final class HudiScanBuilder(
    spark: SparkSession,
    table: HudiTable,
    asOfInstant: Option[String]) {

  private var partitionPredicates: Seq[(String, Set[String])] = Seq.empty
  private var rangePredicates: Seq[(String, Option[String], Option[String])] = Seq.empty

  def partitionIn(column: String, values: Set[String]): HudiScanBuilder = {
    partitionPredicates +:= (column -> values)
    this
  }

  /** Min/max file skipping through the col_stats index (ref read
    * preference `HudiFileStatsExtractor.java:96-103`). Files without
    * index coverage are kept — absence of stats never excludes. */
  def range(column: String, lo: Option[Any], hi: Option[Any]): HudiScanBuilder = {
    rangePredicates +:= ((column, lo.map(_.toString), hi.map(_.toString)))
    this
  }

  /** Pruned file manifest (instant, partitionPath, fileId, path, size). */
  def files(): DataFrame = {
    var df = table.fileSlicesDF(asOfInstant)
    partitionPredicates.foreach { case (c, vs) =>
      // compare whole `k=v` path segments with the wanted values
      // path-ESCAPED (str_to_map splitting broke on values containing
      // ',' or hive %XX escapes — silent row loss)
      val tokens = vs.toSeq.map(v =>
        s"$c=${graft.util.PathCodec.escapePathName(if (v == null) "__HIVE_DEFAULT_PARTITION__" else v)}")
      df = df.filter(arrays_overlap(
        split(col("partitionPath"), "/"), array(tokens.map(lit): _*)))
    }
    if (rangePredicates.nonEmpty) {
      val visible = asOfInstant match {
        case Some(asOf) => table.instants.filter(_ <= asOf)
        case None => table.instants
      }
      HudiColStats.read(spark, table.tablePath, visible).foreach { idx =>
        val schemaByName = table.schemaAt(asOfInstant).fields.map(f => f.name -> f).toMap
        val withName = df.withColumn("fileName", element_at(split(col("path"), "/"), -1))
        val pruned = rangePredicates.foldLeft(withName) { case (acc, (c, lo0, hi0)) =>
          val dt = schemaByName(c).dataType
          val lo = lo0.map(HudiColStats.canonLiteral(dt, _))
          val hi = hi0.map(HudiColStats.canonLiteral(dt, _))
          val minC = HudiColStats.typedCanon(col("minValue"), dt)
          val maxC = HudiColStats.typedCanon(col("maxValue"), dt)
          // provably-outside files only: null bounds keep the file
          val outside = (hi.map(h => minC > HudiColStats.typedCanon(lit(h), dt)) ++
            lo.map(l => maxC < HudiColStats.typedCanon(lit(l), dt)))
            .reduceOption(_ || _).getOrElse(lit(false))
          val excluded = idx.filter(col("column") === c && outside)
            .select(col("partitionPath"), col("fileName"))
          // the index is metadata-sized: broadcast the anti join
          acc.join(broadcast(excluded), Seq("partitionPath", "fileName"), "left_anti")
        }
        df = pruned.drop("fileName")
      }
    }
    df
  }

  def toDF(): DataFrame = {
    val pruned = files().select("path", "partitionPath", "size").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
    table.readFiles(pruned, asOfInstant)
  }
}
