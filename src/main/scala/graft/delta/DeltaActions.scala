package graft.delta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/**
 * The Delta Lake transaction-log action model, implemented natively
 * (no delta runtime on the classpath — SURVEY.md §7). One JSON object
 * per line in `_delta_log/<v>.json`; the union of fields below follows
 * the public Delta protocol spec. The reference drives the same actions
 * through `OptimisticTransaction` (ref `core/.../delta/DeltaClient.java:215-296`,
 * `DeltaDataFileUpdatesExtractor.java:80-120`); we serialize them
 * ourselves.
 */
sealed trait DeltaAction

final case class Protocol(
    minReaderVersion: Int = 1,
    minWriterVersion: Int = 2,
    /** table-features form (reader v3 / writer v7), e.g. deletionVectors */
    readerFeatures: Option[Seq[String]] = None,
    writerFeatures: Option[Seq[String]] = None) extends DeltaAction

final case class DeltaMetadata(
    id: String,
    schemaString: String,
    partitionColumns: Seq[String],
    configuration: Map[String, String],
    createdTime: Long,
    name: Option[String] = None) extends DeltaAction

final case class AddFile(
    path: String,
    partitionValues: Map[String, String],
    size: Long,
    modificationTime: Long,
    dataChange: Boolean,
    stats: Option[String] = None,
    /** deleted-row positions of this file (row-level DELETE) */
    deletionVector: Option[DeletionVectorDescriptor] = None) extends DeltaAction

final case class RemoveFile(
    path: String,
    deletionTimestamp: Long,
    dataChange: Boolean,
    deletionVector: Option[DeletionVectorDescriptor] = None) extends DeltaAction

/** Change-data file (Delta protocol "Add CDC File"): the row-level
  * change records of ONE commit, stored as `_change_data/` parquet with
  * a `_change_type` column. Never table state — readers of the snapshot
  * ignore it; change-feed readers of a commit that carries any `cdc`
  * action use those files EXCLUSIVELY (per the protocol) instead of
  * deriving changes from add/remove actions. */
final case class AddCDCFile(
    path: String,
    partitionValues: Map[String, String],
    size: Long) extends DeltaAction

final case class CommitInfo(
    timestamp: Long,
    operation: String,
    operationParameters: Map[String, String]) extends DeltaAction

/** Line-oriented JSON codec for the actions (Jackson node API). */
object DeltaActionCodec {
  private val mapper = new ObjectMapper()

  private def strMap(o: ObjectNode, field: String, m: Map[String, String]): Unit = {
    val n = o.putObject(field)
    // sorted for byte-stable logs (diff-able, test-friendly)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      if (v == null) n.putNull(k) else n.put(k, v)
    }
  }

  private def putDv(o: ObjectNode, dv: DeletionVectorDescriptor): Unit = {
    val n = o.putObject("deletionVector")
    n.put("storageType", dv.storageType)
    n.put("pathOrInlineDv", dv.pathOrInlineDv)
    dv.offset.foreach(n.put("offset", _))
    n.put("sizeInBytes", dv.sizeInBytes)
    n.put("cardinality", dv.cardinality)
  }

  private def getDv(n: JsonNode): Option[DeletionVectorDescriptor] =
    Option(n.get("deletionVector")).filterNot(_.isNull).map { d =>
      DeletionVectorDescriptor(
        storageType = d.get("storageType").asText(),
        pathOrInlineDv = d.get("pathOrInlineDv").asText(),
        offset = Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        sizeInBytes = d.get("sizeInBytes").asInt(),
        cardinality = d.get("cardinality").asLong())
    }

  def toJsonLine(a: DeltaAction): String = {
    val root = mapper.createObjectNode()
    a match {
      case p: Protocol =>
        val n = root.putObject("protocol")
        n.put("minReaderVersion", p.minReaderVersion)
        n.put("minWriterVersion", p.minWriterVersion)
        p.readerFeatures.foreach { fs =>
          val arr = n.putArray("readerFeatures"); fs.foreach(arr.add)
        }
        p.writerFeatures.foreach { fs =>
          val arr = n.putArray("writerFeatures"); fs.foreach(arr.add)
        }
      case m: DeltaMetadata =>
        val n = root.putObject("metaData")
        n.put("id", m.id)
        m.name.foreach(n.put("name", _))
        val fmt = n.putObject("format")
        fmt.put("provider", "parquet")
        fmt.putObject("options")
        n.put("schemaString", m.schemaString)
        val pc = n.putArray("partitionColumns")
        m.partitionColumns.foreach(pc.add)
        strMap(n, "configuration", m.configuration)
        n.put("createdTime", m.createdTime)
      case f: AddFile =>
        val n = root.putObject("add")
        n.put("path", f.path)
        strMap(n, "partitionValues", f.partitionValues)
        n.put("size", f.size)
        n.put("modificationTime", f.modificationTime)
        n.put("dataChange", f.dataChange)
        f.stats.foreach(n.put("stats", _))
        f.deletionVector.foreach(putDv(n, _))
      case r: RemoveFile =>
        val n = root.putObject("remove")
        n.put("path", r.path)
        n.put("deletionTimestamp", r.deletionTimestamp)
        n.put("dataChange", r.dataChange)
        r.deletionVector.foreach(putDv(n, _))
      case f: AddCDCFile =>
        val n = root.putObject("cdc")
        n.put("path", f.path)
        strMap(n, "partitionValues", f.partitionValues)
        n.put("size", f.size)
        n.put("dataChange", false) // per spec: cdc never changes table state
      case c: CommitInfo =>
        val n = root.putObject("commitInfo")
        n.put("timestamp", c.timestamp)
        n.put("operation", c.operation)
        strMap(n, "operationParameters", c.operationParameters)
    }
    mapper.writeValueAsString(root)
  }

  private def strMapOf(n: JsonNode): Map[String, String] =
    if (n == null) Map.empty
    else n.properties().asScala.map { e =>
      e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
    }.toMap

  def fromJsonLine(line: String): Option[DeltaAction] = {
    val root = mapper.readTree(line)
    if (root.has("protocol")) {
      val n = root.get("protocol")
      def features(field: String): Option[Seq[String]] =
        Option(n.get(field)).filterNot(_.isNull)
          .map(_.elements().asScala.map(_.asText()).toSeq)
      Some(Protocol(n.get("minReaderVersion").asInt, n.get("minWriterVersion").asInt,
        features("readerFeatures"), features("writerFeatures")))
    } else if (root.has("metaData")) {
      val n = root.get("metaData")
      Some(DeltaMetadata(
        id = n.get("id").asText(),
        schemaString = n.get("schemaString").asText(),
        partitionColumns = n.get("partitionColumns").elements().asScala.map(_.asText()).toSeq,
        configuration = strMapOf(n.get("configuration")),
        createdTime = if (n.has("createdTime")) n.get("createdTime").asLong else 0L,
        name = Option(n.get("name")).filterNot(_.isNull).map(_.asText())))
    } else if (root.has("add")) {
      val n = root.get("add")
      Some(AddFile(
        path = n.get("path").asText(),
        partitionValues = strMapOf(n.get("partitionValues")),
        size = n.get("size").asLong,
        modificationTime = if (n.has("modificationTime")) n.get("modificationTime").asLong else 0L,
        dataChange = n.get("dataChange").asBoolean,
        stats = Option(n.get("stats")).filterNot(_.isNull).map(_.asText()),
        deletionVector = getDv(n)))
    } else if (root.has("remove")) {
      val n = root.get("remove")
      Some(RemoveFile(
        path = n.get("path").asText(),
        deletionTimestamp = if (n.has("deletionTimestamp")) n.get("deletionTimestamp").asLong else 0L,
        dataChange = if (n.has("dataChange")) n.get("dataChange").asBoolean else true,
        deletionVector = getDv(n)))
    } else if (root.has("cdc")) {
      val n = root.get("cdc")
      Some(AddCDCFile(
        path = n.get("path").asText(),
        partitionValues = strMapOf(n.get("partitionValues")),
        size = n.get("size").asLong))
    } else if (root.has("commitInfo")) {
      val n = root.get("commitInfo")
      Some(CommitInfo(
        timestamp = if (n.has("timestamp")) n.get("timestamp").asLong else 0L,
        operation = if (n.has("operation")) n.get("operation").asText() else "",
        operationParameters = strMapOf(n.get("operationParameters"))))
    } else None
  }
}
