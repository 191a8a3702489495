package graft.delta

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Native `_delta_log` reader/writer (no Delta runtime — SURVEY.md §7).
 *
 * Write side: one JSON file per commit named `%020d.json`, created with
 * put-if-absent semantics (`FileSystem.create(overwrite = false)`), the
 * same optimistic-concurrency primitive Delta's own commit protocol
 * relies on. The reference commits through `OptimisticTransaction`
 * (ref `core/.../delta/DeltaClient.java:248-264`); we speak the log
 * format directly.
 *
 * Read side: log replay is the classic "last action per path wins"
 * reconciliation (ref `DeltaDataFileExtractor.java:54-114` delegates to
 * DeltaLog.snapshot; here it's a window over a DataFrame of raw
 * actions, so a 100 TB table with millions of add entries replays as a
 * distributed job, not a driver loop).
 */
final class DeltaLog(val tablePath: String, spark: SparkSession) {

  private val logPath = new Path(tablePath, "_delta_log")
  private def fs: FileSystem =
    logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def version(fileName: String): Long = fileName.stripSuffix(".json").toLong
  private def commitFile(v: Long): Path = new Path(logPath, f"$v%020d.json")

  /** Sorted list of committed versions. */
  def listVersions(): Seq[Long] = {
    if (!fs.exists(logPath)) return Seq.empty
    fs.listStatus(logPath).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(version)
      .sorted
  }

  def latestVersion(): Option[Long] = listVersions().lastOption

  /** Versions strictly after `v`, via direct existence probes (Delta
    * versions are contiguous): O(new commits) per call instead of a
    * full log listing — the streaming source's per-trigger tail poll. */
  def listVersionsAfter(v: Long): Seq[Long] =
    Iterator.iterate(v + 1)(_ + 1).takeWhile(x => fs.exists(commitFile(x))).toSeq

  /** Driver-side read of a single commit's actions (metadata-sized). */
  def readActions(v: Long): Seq[DeltaAction] = {
    val in = fs.open(commitFile(v))
    try {
      val content = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8)
      content.split("\n").filter(_.nonEmpty).toSeq
        .flatMap(DeltaActionCodec.fromJsonLine)
    } finally in.close()
  }

  /**
   * Atomically commit actions as the given version. Returns false only
   * when the version already exists (lost the optimistic-concurrency
   * race); any other IO failure propagates.
   *
   * Standard LogStore pattern: the commit body is fully written and
   * closed as a hidden temp file, then published with put-if-absent
   * semantics (graft.util.AtomicPublish) — so a crash mid-write can
   * never leave a torn `%020d.json` that poisons later log replay, and
   * two racing writers can never both claim the same version. (On
   * object stores a real deployment would plug in a put-if-absent
   * LogStore, same as Delta's own.)
   */
  def commit(v: Long, actions: Seq[DeltaAction]): Boolean = {
    fs.mkdirs(logPath)
    val target = commitFile(v)
    if (fs.exists(target)) return false // cheap fast-path; publish still arbitrates races
    val tmp = new Path(logPath, s".tmp_${java.util.UUID.randomUUID()}_$v.json")
    val out = fs.create(tmp, /*overwrite=*/ true)
    try {
      val body = actions.map(DeltaActionCodec.toJsonLine).mkString("", "\n", "\n")
      out.write(body.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    graft.util.AtomicPublish.putIfAbsent(
      fs, spark.sparkContext.hadoopConfiguration, tmp, target)
  }

  // ----------------------------------------------------------- checkpoints

  /** Delta protocol checkpoint: `%020d.checkpoint.parquet` holds the
    * reconciled live state at version N, `_last_checkpoint` points at
    * it, and replay reads checkpoint + post-checkpoint JSON only — so a
    * 10^4-commit table plans from one parquet file plus a handful of
    * JSON commits instead of replaying every commit since v0 (public
    * Delta checkpoint spec; the reference leans on DeltaLog's
    * equivalent). */
  private def checkpointFile(v: Long): Path =
    new Path(logPath, f"$v%020d.checkpoint.parquet")
  private val lastCheckpointPath = new Path(logPath, "_last_checkpoint")

  /** Version of the newest checkpoint, if any. */
  def lastCheckpoint(): Option[Long] = {
    if (!fs.exists(lastCheckpointPath)) return None
    val in = fs.open(lastCheckpointPath)
    try {
      val content = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8)
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(content)
      Option(node.get("version")).map(_.asLong())
    } finally in.close()
  }

  /** Checkpoint interval (Delta's default). */
  val checkpointInterval = 10

  def maybeCheckpoint(v: Long): Unit =
    if (v > 0 && v % checkpointInterval == 0) writeCheckpoint(v)

  /** Write the reconciled snapshot at `v` as a single checkpoint parquet
    * + `_last_checkpoint`. Tombstones are omitted (nothing vacuums data
    * files out from under readers here); replay ordering stays correct
    * because post-checkpoint removes outrank checkpoint adds by
    * version. */
  def writeCheckpoint(v: Long): Unit = {
    val (meta, _) = metadataAt(Some(v))
    val protoRow = protocolAt(Some(v))
    val metaSchema = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val protoSchema = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
    val addType = actionSchema("add").dataType
    val adds = snapshotFilesDF(Some(v)).select(
      struct(
        col("path"), col("partitionValues"), col("size"),
        col("modificationTime"), lit(true).as("dataChange"), col("stats"),
        col("deletionVector")).as("add"),
      lit(null).cast(metaSchema).as("metaData"),
      lit(null).cast(protoSchema).as("protocol"))
    val single = spark.range(1).select(
      lit(null).cast(addType).as("add"),
      struct(
        lit(meta.id).as("id"),
        lit(meta.schemaString).as("schemaString"),
        typedlit(meta.partitionColumns).as("partitionColumns"),
        typedlit(meta.configuration).as("configuration"),
        lit(meta.createdTime).as("createdTime")).as("metaData"),
      struct(
        lit(protoRow.minReaderVersion).as("minReaderVersion"),
        lit(protoRow.minWriterVersion).as("minWriterVersion"),
        typedlit(protoRow.readerFeatures).as("readerFeatures"),
        typedlit(protoRow.writerFeatures).as("writerFeatures")).as("protocol"))
    val staging = new Path(logPath, s".cp-staging-${java.util.UUID.randomUUID()}")
    adds.unionByName(single).repartition(1).write.parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(p => p.getName.endsWith(".parquet")).get
    fs.delete(checkpointFile(v), false)
    require(fs.rename(part, checkpointFile(v)), s"failed to place checkpoint $v")
    fs.delete(staging, true)
    val out = fs.create(lastCheckpointPath, /*overwrite=*/ true)
    try out.write(s"""{"version":$v,"size":1}""".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Delete JSON commits strictly before `version` — log retention
    * cleanup (ref `core/.../delta/DeltaClient.java:265-275`). Refuses to
    * expire history the latest checkpoint doesn't cover, so the current
    * snapshot always stays reconstructable. */
  def expireLogBefore(version: Long): Int = {
    val cp = lastCheckpoint().getOrElse(
      throw new IllegalStateException(s"no checkpoint in $tablePath; cannot expire log"))
    require(version <= cp, s"cannot expire to v$version: newest checkpoint is v$cp")
    val victims = listVersions().filter(_ < version)
    victims.foreach(v => fs.delete(commitFile(v), false))
    victims.size
  }

  /** Latest metadata + protocol at or before `asOf`. */
  def metadataAt(asOf: Option[Long]): (DeltaMetadata, Long) = {
    val versions = listVersions()
    val cp = lastCheckpoint().filter(c => asOf.forall(c <= _))
    require(versions.nonEmpty || cp.nonEmpty,
      s"not a Delta table (no _delta_log): $tablePath")
    val upTo = asOf.map(a => versions.filter(_ <= a)).getOrElse(versions)
    require(upTo.nonEmpty || cp.nonEmpty,
      s"no commit at or before version ${asOf.get} in $tablePath")
    // scan post-checkpoint JSON newest-to-oldest; fall back to the
    // checkpoint's metaData row (pre-checkpoint JSON may be cleaned up)
    val tail = upTo.filter(v => cp.forall(v > _))
    val fromJson = tail.reverse.iterator
      .map(v => readActions(v).collectFirst { case m: DeltaMetadata => m })
      .collectFirst { case Some(m) => m }
    val meta = fromJson.orElse(cp.flatMap { c =>
      spark.read.parquet(checkpointFile(c).toString)
        .filter(col("metaData").isNotNull)
        .select("metaData.id", "metaData.schemaString", "metaData.partitionColumns",
          "metaData.configuration", "metaData.createdTime")
        .collect().headOption.map(r => DeltaMetadata(
          id = r.getString(0),
          schemaString = r.getString(1),
          partitionColumns = r.getSeq[String](2),
          configuration = if (r.isNullAt(3)) Map.empty else r.getMap[String, String](3).toMap,
          createdTime = if (r.isNullAt(4)) 0L else r.getLong(4)))
    })
    (meta.getOrElse(throw new IllegalStateException(s"no metaData action in $tablePath")),
      (upTo ++ cp).max)
  }

  /**
   * Protocol in effect at or before `asOf`, replayed like `metadataAt`:
   * newest Protocol action in the post-checkpoint JSON tail, else the
   * checkpoint's protocol row, else the spec default (1, 2). Reading
   * version 0 alone is wrong twice over — v0 always carries the default
   * protocol even after a table-features upgrade, and log expiry can
   * delete the v0 JSON entirely.
   */
  def protocolAt(asOf: Option[Long]): Protocol = {
    val versions = listVersions()
    val cp = lastCheckpoint().filter(c => asOf.forall(c <= _))
    val upTo = asOf.map(a => versions.filter(_ <= a)).getOrElse(versions)
    val tail = upTo.filter(v => cp.forall(v > _))
    val fromJson = tail.reverse.iterator
      .map(v => readActions(v).collectFirst { case p: Protocol => p })
      .collectFirst { case Some(p) => p }
    fromJson.orElse(cp.flatMap { c =>
      val df = spark.read.parquet(checkpointFile(c).toString)
      // feature columns are absent in checkpoints written before the
      // table-features upgrade shipped
      val hasFeatureCols = df.schema("protocol").dataType match {
        case s: StructType => s.fieldNames.contains("readerFeatures")
        case _ => false
      }
      val rows =
        if (hasFeatureCols)
          df.filter(col("protocol").isNotNull).select(
            col("protocol.minReaderVersion"), col("protocol.minWriterVersion"),
            col("protocol.readerFeatures"), col("protocol.writerFeatures")).collect()
        else
          df.filter(col("protocol").isNotNull).select(
            col("protocol.minReaderVersion"), col("protocol.minWriterVersion"),
            lit(null).cast(ArrayType(StringType)), lit(null).cast(ArrayType(StringType))).collect()
      rows.headOption.map(r => Protocol(
        r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getSeq[String](2)),
        if (r.isNullAt(3)) None else Some(r.getSeq[String](3))))
    }).getOrElse(Protocol())
  }

  /** Commit timestamps (from commitInfo, fallback file mtime) per version. */
  def commitTimestamps(): Seq[(Long, Long)] =
    listVersions().map { v =>
      val ts = readActions(v).collectFirst { case c: CommitInfo => c.timestamp }
        .getOrElse(fs.getFileStatus(commitFile(v)).getModificationTime)
      (v, ts)
    }

  /** Spark schema used to parse raw log lines distributed. */
  private val dvSchema = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))

  private val actionSchema: StructType = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", dvSchema)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType))))))

  /**
   * Raw add/remove actions of all commits ≤ `asOf` as a DataFrame with a
   * `version` column — the input to distributed replay.
   */
  def actionsDF(asOf: Option[Long]): DataFrame = {
    val all = listVersions()
    // replay = checkpoint base (if one applies at/before asOf) + JSON tail
    val cp = lastCheckpoint().filter(c => asOf.forall(c <= _))
    val versions = all
      .filter(v => asOf.forall(v <= _))
      .filter(v => cp.forall(v > _))
    require(versions.nonEmpty || cp.nonEmpty, s"not a Delta table: $tablePath")
    val jsonTail: Option[DataFrame] =
      if (versions.isEmpty) None
      else Some {
        val paths = versions.map(v => commitFile(v).toString)
        spark.read.text(paths: _*)
          .withColumn("version",
            regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast(LongType))
          .withColumn("action", from_json(col("value"), actionSchema))
          .select(col("version"), col("action.add").as("add"), col("action.remove").as("remove"))
          .filter(col("add").isNotNull || col("remove").isNotNull)
      }
    val base: Option[DataFrame] = cp.map { c =>
      spark.read.parquet(checkpointFile(c).toString)
        .filter(col("add").isNotNull)
        .select(lit(c).as("version"), col("add"),
          lit(null).cast(actionSchema("remove").dataType).as("remove"))
    }
    (base, jsonTail) match {
      case (Some(b), Some(t)) => b.unionByName(t)
      case (Some(b), None)    => b
      case (None, Some(t))    => t
      case _ => throw new IllegalStateException(s"not a Delta table: $tablePath")
    }
  }

  /**
   * Live files at `asOf` (default: latest): per path, the newest action
   * wins; the file is live iff that action is an add. One shuffle on
   * path, no driver-side state.
   */
  def snapshotFilesDF(asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val acts = actionsDF(asOf)
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("version"),
        col("add").isNotNull.as("isAdd"),
        col("add.partitionValues").as("partitionValues"),
        col("add.size").as("size"),
        col("add.modificationTime").as("modificationTime"),
        col("add.stats").as("stats"),
        col("add.deletionVector").as("deletionVector"))
    // within one version, the add outranks the remove of the same path:
    // a row-level DELETE rewrites a file's entry as remove(old DV) +
    // add(new DV) in a single commit, and the add is the live state
    val w = Window.partitionBy(col("path"))
      .orderBy(col("version").desc, col("isAdd").desc)
    acts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("isAdd"))
      .drop("rn", "isAdd")
  }

  /**
   * Per-commit change feed for versions in (from, to] — the incremental
   * sync source (ref `DeltaSourceClient.getTableChangeForCommit`,
   * `core/.../delta/DeltaSourceClient.java:106-143`).
   */
  def changesDF(fromExclusive: Long, toInclusive: Long): DataFrame = {
    val versions = listVersions().filter(v => v > fromExclusive && v <= toInclusive)
    require(versions.nonEmpty, s"no commits in ($fromExclusive, $toInclusive] of $tablePath")
    val paths = versions.map(v => commitFile(v).toString)
    spark.read.text(paths: _*)
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast(LongType))
      .withColumn("action", from_json(col("value"), actionSchema))
      .select(
        col("version"),
        col("action.add").isNotNull.as("added"),
        coalesce(col("action.add.path"), col("action.remove.path")).as("path"),
        col("action.add.partitionValues").as("partitionValues"),
        col("action.add.size").as("size"),
        col("action.add.stats").as("stats"),
        col("action.add.deletionVector").as("deletionVector"))
      .filter(col("path").isNotNull)
  }
}

object DeltaLog {
  def forTable(spark: SparkSession, tablePath: String): DeltaLog =
    new DeltaLog(tablePath, spark)
}
