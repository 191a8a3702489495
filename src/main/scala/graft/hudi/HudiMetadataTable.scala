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
 * name, isDeleted tombstones) match; the col_stats / bloom_filters
 * metadata partitions stay out of scope.
 */
object HudiMetadataTable {

  val MetadataDir = ".hoodie/metadata"
  val FilesPartition = "files"
  val AllPartitionsKey = "__all_partitions__"
  /** HoodieMetadataRecord.type for filesystem metadata records. */
  val TypeFilesystemMetadata = 2
  private val FilesFileId = "files-0000"

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

  private def root(tablePath: String) = new Path(tablePath, MetadataDir)
  private def filesDir(tablePath: String) = new Path(root(tablePath), FilesPartition)

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
      removes: Map[String, Seq[String]] = Map.empty): Unit = {
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
    val block = HudiLogFormat.LogBlock(
      HudiLogFormat.AvroDataBlock,
      Map(
        HudiLogFormat.HeaderInstantTime -> instant,
        HudiLogFormat.HeaderSchema -> RecordSchema.toString),
      HudiLogFormat.encodeAvroBlock(RecordSchema, records.iterator))
    fs.mkdirs(filesDir(tablePath))
    val version = 1 + fs.listStatus(filesDir(tablePath)) // next log version
      .count(st => HudiLogFormat.isLogPath(st.getPath.getName))
    val logPath = new Path(filesDir(tablePath),
      HudiLogFormat.logFileName(FilesFileId, instant, version))
    HudiLogFormat.write(fs, logPath, Seq(block))
    val meta = HudiCommitMetadata(
      partitionToWriteStats = Map(FilesPartition -> Seq(HudiWriteStat(
        fileId = FilesFileId,
        path = s"$FilesPartition/${logPath.getName}",
        prevCommit = timeline.completedInstants().lastOption.map(_.time).getOrElse("null"),
        numWrites = records.size.toLong,
        fileSizeInBytes = fs.getFileStatus(logPath).getLen))),
      partitionToReplaceFileIds = Map.empty,
      extraMetadata = Map.empty,
      operationType = "UPSERT")
    // lost race = another writer recorded this instant already: fine
    timeline.commit(HudiInstant(instant, "deltacommit"), meta)
  }

  /** True when the table carries a metadata table with a files partition. */
  def exists(fs: FileSystem, tablePath: String): Boolean =
    fs.exists(filesDir(tablePath))

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
