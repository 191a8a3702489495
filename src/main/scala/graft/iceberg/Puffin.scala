package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

/** One blob's metadata — the shape shared by the Puffin footer's
  * `blobs` array and metadata.json's `statistics[].blob-metadata`
  * (Puffin spec + table spec `statistics` — both public). */
final case class IcebergBlobMetadata(
    blobType: String,
    fields: Seq[Int],
    snapshotId: Long,
    sequenceNumber: Long,
    offset: Long,
    length: Long,
    properties: Map[String, String])

/** One `statistics` entry of metadata.json (table spec: snapshot-id,
  * statistics-path, file sizes, blob-metadata). */
final case class IcebergStatisticsFile(
    snapshotId: Long,
    path: String,
    fileSizeBytes: Long,
    footerSizeBytes: Long,
    blobs: Seq[IcebergBlobMetadata])

/** One `partition-statistics` entry of metadata.json (table spec —
  * the sibling list of `statistics`): a sorted parquet file of
  * per-partition row/file/byte rollups for one snapshot. */
final case class IcebergPartitionStatisticsFile(
    snapshotId: Long,
    path: String,
    fileSizeBytes: Long)

/**
 * Puffin statistics-file container (the PUBLIC Puffin spec,
 * iceberg.apache.org/puffin-spec): `Magic Blob₁…Blobₙ Footer` where
 * Footer = `Magic FooterPayload(JSON) FooterPayloadSize(int32 LE)
 * Flags(4B) Magic` and the payload lists each blob's type, field ids,
 * snapshot/sequence anchors, offset+length and properties. This repo
 * writes uncompressed payloads (flags = 0) and its own documented blob
 * type (`graft-hll-256-v1`: 256 one-byte HLL registers, the q35
 * portable sketch, with the estimate in the `ndv` blob property — the
 * cross-engine ndv convention); foreign blob types read back as
 * opaque bytes with their metadata intact.
 */
object Puffin {

  val Magic: Array[Byte] = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  /** The repo-native sketch blob type (256-bucket md5 HLL). */
  val HllBlobType = "graft-hll-256-v1"

  private def mapper = new ObjectMapper()

  /** Write `blobs` (metadata sans offset/length + payload) as one
    * Puffin file; returns the statistics-file entry for metadata.json. */
  def write(
      fs: FileSystem, path: Path, snapshotId: Long, sequenceNumber: Long,
      blobs: Seq[(String, Seq[Int], Map[String, String], Array[Byte])]):
      IcebergStatisticsFile = {
    val placed = scala.collection.mutable.ArrayBuffer[IcebergBlobMetadata]()
    val out = fs.create(path, true)
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      blobs.foreach { case (tpe, fields, props, payload) =>
        placed += IcebergBlobMetadata(
          tpe, fields, snapshotId, sequenceNumber, offset, payload.length.toLong, props)
        out.write(payload)
        offset += payload.length
      }
      val payloadJson = footerPayload(placed.toSeq).getBytes(StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payloadJson)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payloadJson.length)
      tail.putInt(0) // flags: payload uncompressed
      out.write(tail.array())
      out.write(Magic)
      val footerSize = Magic.length + payloadJson.length + 8 + Magic.length
      val fileSize = offset + footerSize
      IcebergStatisticsFile(
        snapshotId, path.toString, fileSize, footerSize.toLong, placed.toSeq)
    } finally out.close()
  }

  private def footerPayload(blobs: Seq[IcebergBlobMetadata]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("blobs")
    blobs.foreach { b =>
      val n = arr.addObject()
      n.put("type", b.blobType)
      val f = n.putArray("fields")
      b.fields.foreach(f.add)
      n.put("snapshot-id", b.snapshotId)
      n.put("sequence-number", b.sequenceNumber)
      n.put("offset", b.offset)
      n.put("length", b.length)
      if (b.properties.nonEmpty) {
        val p = n.putObject("properties")
        b.properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
      }
    }
    root.putObject("properties")
    mapper.writeValueAsString(root)
  }

  /** Parse a Puffin file's footer (blob metadata; payloads stay on
    * disk — read them with [[blobPayload]]). Refuses loudly on a
    * wrong magic or a compressed footer (this reader writes neither). */
  def readFooter(fs: FileSystem, path: Path): Seq[IcebergBlobMetadata] = {
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      def readAt(pos: Long, n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        in.readFully(pos, buf)
        buf
      }
      require(readAt(0, 4).sameElements(Magic), s"$path: not a Puffin file (head magic)")
      require(readAt(len - 4, 4).sameElements(Magic), s"$path: truncated Puffin footer")
      val tail = ByteBuffer.wrap(readAt(len - 12, 8)).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tail.getInt
      val flags = tail.getInt
      require((flags & 1) == 0, s"$path: compressed Puffin footer payload unsupported")
      val payloadStart = len - 12 - payloadSize
      require(readAt(payloadStart - 4, 4).sameElements(Magic),
        s"$path: Puffin footer magic missing before payload")
      val root = mapper.readTree(
        new String(readAt(payloadStart, payloadSize), StandardCharsets.UTF_8))
      import scala.jdk.CollectionConverters._
      Option(root.get("blobs")).map(_.elements().asScala.map { b =>
        IcebergBlobMetadata(
          b.get("type").asText(),
          Option(b.get("fields")).map(_.elements().asScala.map(_.asInt()).toSeq)
            .getOrElse(Seq.empty),
          b.get("snapshot-id").asLong(),
          b.get("sequence-number").asLong(),
          b.get("offset").asLong(),
          b.get("length").asLong(),
          Option(b.get("properties")).map(p =>
            p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty))
      }.toSeq).getOrElse(Seq.empty)
    } finally in.close()
  }

  /** Read one blob's payload bytes. */
  def blobPayload(fs: FileSystem, path: Path, blob: IcebergBlobMetadata): Array[Byte] = {
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](blob.length.toInt)
      in.readFully(blob.offset, buf)
      buf
    } finally in.close()
  }
}
