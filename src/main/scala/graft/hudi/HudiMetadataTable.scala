package graft.hudi

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import scala.jdk.CollectionConverters._

/**
 * The Hudi metadata table's `files` partition, in Hudi's documented
 * layout: a merge-on-read table rooted at `<table>/.hoodie/metadata`
 * with its own `.hoodie` timeline of deltacommits (one per data-table
 * commit, SAME instant times — the Hudi convention), a `files/`
 * partition holding one log file per commit, and records in the
 * HoodieMetadataRecord shape (key = partition path, `filesystemMetadata`
 * map of file name → {size, isDeleted}; the `__all_partitions__` key
 * lists partition paths). Native readers learn file listings from this
 * table instead of listing the filesystem (ref
 * `core/.../hudi/BaseFileUpdatesExtractor.java:240-262`,
 * `HudiTargetClient.java:569-575` delegate to Hudi's
 * HoodieBackedTableMetadataWriter).
 *
 * Documented delta vs. Hudi's own writer: records land as AVRO data
 * blocks in the log files (the log-format block type this engine
 * writes natively); Hudi's writer compacts them into HFILE base files
 * and HFILE log blocks for point lookups. The partition layout, record
 * schema, timeline, and merge semantics (later block wins per file
 * name, isDeleted tombstones) match.
 *
 * The `column_stats` partition follows the same discipline: one log
 * file per stats-bearing commit, HoodieMetadataRecord type=3 records
 * keyed by Hudi's concatenated index-ID scheme
 * (ColumnIndexID(column) + PartitionIndexID(partition) +
 * FileIndexID(file), each the base64 of the seed-0 XXHash64 of the
 * name — [[graft.util.XxHash64.indexId]]), each record carrying
 * (fileName, columnName, min/max, nullCount, valueCount, totalSize)
 * so native readers can skip files from the index (ref
 * `core/.../hudi/BaseFileUpdatesExtractor.java:240-262` builds
 * HoodieColumnRangeMetadata per write stat; `HudiTargetClient.java:569-575`
 * flushes them through Hudi's metadata writer). Documented subset:
 * min/max travel as canonical strings (this engine's cross-format
 * stat form), not Hudi's per-type avro wrapper union.
 */
object HudiMetadataTable {

  val MetadataDir = ".hoodie/metadata"
  val FilesPartition = "files"
  val ColumnStatsPartition = "column_stats"
  val AllPartitionsKey = "__all_partitions__"
  /** HoodieMetadataRecord.type for filesystem metadata records. */
  val TypeFilesystemMetadata = 2
  /** HoodieMetadataRecord.type for column-stats records. */
  val TypeColumnStats = 3
  private val FilesFileId = "files-0000"
  private val ColStatsFileId = "col-stats-0000"

  /** HoodieMetadataRecord avro schema (the public Hudi shape, trimmed
    * to the files-partition fields). */
  val RecordSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"HoodieMetadataRecord",
      |"namespace":"org.apache.hudi.avro.model","fields":[
      |{"name":"key","type":"string"},
      |{"name":"type","type":"int"},
      |{"name":"filesystemMetadata","type":["null",{"type":"map","values":
      |{"type":"record","name":"HoodieMetadataFileInfo","fields":[
      |{"name":"size","type":"long"},
      |{"name":"isDeleted","type":"boolean"}]}}],"default":null}]}""".stripMargin)

  /** HoodieMetadataRecord trimmed to the column_stats fields
    * (HoodieMetadataColumnStats shape; min/max as canonical strings —
    * see the class doc). */
  val ColStatsSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"HoodieMetadataRecord",
      |"namespace":"org.apache.hudi.avro.model","fields":[
      |{"name":"key","type":"string"},
      |{"name":"type","type":"int"},
      |{"name":"ColumnStatsMetadata","type":["null",
      |{"type":"record","name":"HoodieMetadataColumnStats","fields":[
      |{"name":"fileName","type":"string"},
      |{"name":"columnName","type":"string"},
      |{"name":"minValue","type":["null","string"],"default":null},
      |{"name":"maxValue","type":["null","string"],"default":null},
      |{"name":"valueCount","type":"long"},
      |{"name":"nullCount","type":"long"},
      |{"name":"totalSize","type":"long"},
      |{"name":"isDeleted","type":"boolean"}]}],"default":null}]}""".stripMargin)

  /** Hudi's column-stats record key: concatenated base64 XXHash64 index
    * IDs of column, partition (`.` for the empty partition), and file. */
  def columnStatsKey(column: String, partitionPath: String, fileName: String): String =
    graft.util.XxHash64.indexId(column) +
      graft.util.XxHash64.indexId(if (partitionPath.isEmpty) "." else partitionPath) +
      graft.util.XxHash64.indexId(fileName)

  private def root(tablePath: String) = new Path(tablePath, MetadataDir)
  private def filesDir(tablePath: String) = new Path(root(tablePath), FilesPartition)
  private def colStatsDir(tablePath: String) = new Path(root(tablePath), ColumnStatsPartition)

  /**
   * Record one data-table commit in the metadata table: `adds` and
   * `removes` are (partitionPath → file names with sizes / names).
   * Appends one log file to the `files` partition and completes a
   * deltacommit at the data commit's instant time on the metadata
   * table's own timeline. Idempotent per instant (put-if-absent
   * timeline commit arbitrates).
   */
  def update(
      fs: FileSystem,
      conf: Configuration,
      tablePath: String,
      instant: String,
      adds: Map[String, Seq[(String, Long)]],
      removes: Map[String, Seq[String]] = Map.empty,
      /** (partitionPath, fileName, stat rows) per stats-bearing file —
        * lands in the `column_stats` partition (see class doc). */
      colStats: Seq[(String, String, Seq[graft.model.ColumnStatRow])] = Seq.empty): Unit = {
    val timeline = new HudiTimeline(root(tablePath).toString, conf)
    if (!timeline.exists)
      timeline.writeProperties(Map(
        "hoodie.table.name" -> "metadata",
        "hoodie.table.type" -> "MERGE_ON_READ",
        "hoodie.table.version" -> "6",
        "hoodie.table.partition.fields" -> "",
        "hoodie.populate.meta.fields" -> "false"))
    val touched = (adds.keySet ++ removes.keySet).toSeq.sorted
    if (touched.isEmpty) return
    val records: Seq[GenericRecord] = touched.map { pp =>
      val rec = new GenericData.Record(RecordSchema)
      rec.put("key", if (pp.isEmpty) "." else pp)
      rec.put("type", TypeFilesystemMetadata)
      val infoSchema = RecordSchema.getField("filesystemMetadata")
        .schema().getTypes.get(1).getValueType
      val m = new java.util.HashMap[String, AnyRef]()
      adds.getOrElse(pp, Seq.empty).foreach { case (name, size) =>
        val info = new GenericData.Record(infoSchema)
        info.put("size", java.lang.Long.valueOf(size))
        info.put("isDeleted", java.lang.Boolean.FALSE)
        m.put(name, info)
      }
      removes.getOrElse(pp, Seq.empty).foreach { name =>
        val info = new GenericData.Record(infoSchema)
        info.put("size", java.lang.Long.valueOf(0L))
        info.put("isDeleted", java.lang.Boolean.TRUE)
        m.put(name, info)
      }
      rec.put("filesystemMetadata", m)
      rec
    } :+ {
      // partition-list record: every partition path this table has seen
      val rec = new GenericData.Record(RecordSchema)
      rec.put("key", AllPartitionsKey)
      rec.put("type", TypeFilesystemMetadata)
      val infoSchema = RecordSchema.getField("filesystemMetadata")
        .schema().getTypes.get(1).getValueType
      val m = new java.util.HashMap[String, AnyRef]()
      touched.foreach { pp =>
        val info = new GenericData.Record(infoSchema)
        info.put("size", java.lang.Long.valueOf(0L))
        info.put("isDeleted", java.lang.Boolean.FALSE)
        m.put(if (pp.isEmpty) "." else pp, info)
      }
      rec.put("filesystemMetadata", m)
      rec
    }
    val filesLog = writeLogFile(fs, filesDir(tablePath), FilesFileId, instant,
      RecordSchema, records)
    if (filesLog.isEmpty) return // a racer already recorded this instant
    val statRecords: Seq[GenericRecord] = colStats.flatMap { case (pp, fileName, cols) =>
      cols.map { c =>
        val rec = new GenericData.Record(ColStatsSchema)
        rec.put("key", columnStatsKey(c.column, pp, fileName))
        rec.put("type", TypeColumnStats)
        val csSchema = ColStatsSchema.getField("ColumnStatsMetadata")
          .schema().getTypes.get(1)
        val cs = new GenericData.Record(csSchema)
        cs.put("fileName", fileName)
        cs.put("columnName", c.column)
        cs.put("minValue", c.minValue.orNull)
        cs.put("maxValue", c.maxValue.orNull)
        cs.put("valueCount", java.lang.Long.valueOf(c.numValues))
        cs.put("nullCount", java.lang.Long.valueOf(c.numNulls))
        cs.put("totalSize", java.lang.Long.valueOf(c.totalSize))
        cs.put("isDeleted", java.lang.Boolean.FALSE)
        rec.put("ColumnStatsMetadata", cs)
        rec
      }
    }
    val statsLog =
      if (statRecords.isEmpty) None
      else writeLogFile(fs, colStatsDir(tablePath), ColStatsFileId, instant,
        ColStatsSchema, statRecords)
    val prev = timeline.completedInstants().lastOption.map(_.time).getOrElse("null")
    def stat(fileId: String, partition: String, p: Path, n: Long) = HudiWriteStat(
      fileId = fileId,
      path = s"$partition/${p.getName}",
      prevCommit = prev,
      numWrites = n,
      fileSizeInBytes = fs.getFileStatus(p).getLen)
    val meta = HudiCommitMetadata(
      partitionToWriteStats =
        Map(FilesPartition ->
          Seq(stat(FilesFileId, FilesPartition, filesLog.get, records.size.toLong))) ++
          statsLog.map(p => ColumnStatsPartition ->
            Seq(stat(ColStatsFileId, ColumnStatsPartition, p, statRecords.size.toLong))),
      partitionToReplaceFileIds = Map.empty,
      extraMetadata = Map.empty,
      operationType = "UPSERT")
    // lost race = another writer recorded this instant already: fine
    timeline.commit(HudiInstant(instant, "deltacommit"), meta)
  }

  /** Append one AVRO-block log file to a metadata partition; None when
    * a racer already wrote this instant's log (idempotent per instant:
    * same records, keep theirs — invisible anyway until the
    * deltacommit completes). */
  private def writeLogFile(
      fs: FileSystem, dir: Path, fileId: String, instant: String,
      schema: Schema, records: Seq[GenericRecord]): Option[Path] = {
    val block = HudiLogFormat.LogBlock(
      HudiLogFormat.AvroDataBlock,
      Map(
        HudiLogFormat.HeaderInstantTime -> instant,
        HudiLogFormat.HeaderSchema -> schema.toString),
      HudiLogFormat.encodeAvroBlock(schema, records.iterator))
    fs.mkdirs(dir)
    val version = 1 + fs.listStatus(dir) // next log version
      .count(st => HudiLogFormat.isLogPath(st.getPath.getName))
    val logPath = new Path(dir, HudiLogFormat.logFileName(fileId, instant, version))
    try { HudiLogFormat.write(fs, logPath, Seq(block)); Some(logPath) }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
      case _: java.nio.file.FileAlreadyExistsException => None
      case _: java.io.IOException if fs.exists(logPath) => None
    }
  }

  /** True when the table carries a metadata table with a files partition. */
  def exists(fs: FileSystem, tablePath: String): Boolean =
    fs.exists(filesDir(tablePath))

  /** True when the metadata table carries a column_stats partition. */
  def hasColumnStats(fs: FileSystem, tablePath: String): Boolean =
    fs.exists(colStatsDir(tablePath))

  /**
   * Replay the column_stats partition: merged stat rows per
   * (fileName, columnName) — later blocks win, isDeleted drops — the
   * skipping index a native reader derives instead of footer scans.
   */
  def readColumnStats(
      fs: FileSystem, conf: Configuration,
      tablePath: String): Seq[(String, graft.model.ColumnStatRow)] = {
    if (!hasColumnStats(fs, tablePath)) return Seq.empty
    val timeline = new HudiTimeline(root(tablePath).toString, conf)
    val completed = timeline.completedInstants().map(_.time).toSet
    val logs = fs.listStatus(colStatsDir(tablePath)).toSeq
      .map(_.getPath)
      .filter(p => HudiLogFormat.isLogPath(p.getName))
      .sortBy(_.getName)
    val state = scala.collection.mutable.LinkedHashMap[(String, String), Option[graft.model.ColumnStatRow]]()
    logs.foreach { p =>
      HudiLogFormat.readBlocks(fs, p)
        .filter(b => b.blockType == HudiLogFormat.AvroDataBlock &&
          b.headers.get(HudiLogFormat.HeaderInstantTime).exists(completed.contains))
        .foreach { b =>
          val schema = new Schema.Parser().parse(b.headers(HudiLogFormat.HeaderSchema))
          HudiLogFormat.decodeAvroBlock(b.content, schema).foreach { rec =>
            Option(rec.get("ColumnStatsMetadata")).foreach { csAny =>
              val cs = csAny.asInstanceOf[GenericRecord]
              val fileName = cs.get("fileName").toString
              val column = cs.get("columnName").toString
              val deleted = cs.get("isDeleted").asInstanceOf[Boolean]
              state((fileName, column)) =
                if (deleted) None
                else Some(graft.model.ColumnStatRow(
                  column = column,
                  minValue = Option(cs.get("minValue")).map(_.toString),
                  maxValue = Option(cs.get("maxValue")).map(_.toString),
                  numNulls = cs.get("nullCount").asInstanceOf[Long],
                  numValues = cs.get("valueCount").asInstanceOf[Long],
                  totalSize = cs.get("totalSize").asInstanceOf[Long]))
            }
          }
        }
    }
    state.toSeq.collect { case ((fileName, _), Some(row)) => fileName -> row }
  }

  /**
   * Replay the files partition: merged file listing per partition path
   * (later blocks win per file name; isDeleted entries drop out) —
   * what a native reader derives instead of listing the filesystem.
   */
  def readFiles(fs: FileSystem, conf: Configuration, tablePath: String): Map[String, Map[String, Long]] = {
    if (!exists(fs, tablePath)) return Map.empty
    val timeline = new HudiTimeline(root(tablePath).toString, conf)
    val completed = timeline.completedInstants().map(_.time).toSet
    val logs = fs.listStatus(filesDir(tablePath)).toSeq
      .map(_.getPath)
      .filter(p => HudiLogFormat.isLogPath(p.getName))
      .sortBy(_.getName)
    val state = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, Option[Long]]]()
    logs.foreach { p =>
      HudiLogFormat.readBlocks(fs, p)
        .filter(b => b.blockType == HudiLogFormat.AvroDataBlock &&
          // uncommitted (crashed) log files are invisible, like any MOR read
          b.headers.get(HudiLogFormat.HeaderInstantTime).exists(completed.contains))
        .foreach { b =>
          val schema = new Schema.Parser().parse(b.headers(HudiLogFormat.HeaderSchema))
          HudiLogFormat.decodeAvroBlock(b.content, schema).foreach { rec =>
            val key = rec.get("key").toString
            if (key != AllPartitionsKey) {
              val part = state.getOrElseUpdate(key, scala.collection.mutable.Map.empty)
              Option(rec.get("filesystemMetadata")).foreach {
                case m: java.util.Map[_, _] =>
                  m.asScala.foreach { case (name, info) =>
                    val i = info.asInstanceOf[GenericRecord]
                    val deleted = i.get("isDeleted").asInstanceOf[Boolean]
                    part(name.toString) =
                      if (deleted) None else Some(i.get("size").asInstanceOf[Long])
                  }
                case _ =>
              }
            }
          }
        }
    }
    state.map { case (pp, files) =>
      pp -> files.collect { case (n, Some(size)) => n -> size }.toMap
    }.filter(_._2.nonEmpty).toMap
  }
}
