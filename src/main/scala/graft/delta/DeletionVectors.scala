package graft.delta

import java.io.{DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Delta Lake deletion vectors, implemented natively against the public
 * Delta protocol spec (PROTOCOL.md "Deletion Vectors"): a DV is a set of
 * deleted row positions of one data file, stored as a 64-bit
 * RoaringBitmapArray ("portable" serialization), either inline in the
 * log (storageType `i`, Z85-encoded) or in a `deletion_vector_<uuid>.bin`
 * sidecar file (storageType `u`/`p`). The reference has no row-level
 * delete plane at all — this is engine surface beyond it, needed to READ
 * real Delta tables written with `delta.enableDeletionVectors`.
 */
final case class DeletionVectorDescriptor(
    storageType: String, // "u" relative-UUID file, "i" inline, "p" absolute path
    pathOrInlineDv: String,
    offset: Option[Int],
    sizeInBytes: Int,
    cardinality: Long) {

  /** Absolute path of the sidecar file (None for inline). Per the spec,
    * `u` encodes `[<randomPrefix>]<z85 uuid>` relative to the table root. */
  def absolutePath(tablePath: String): Option[String] = storageType match {
    case "i" => None
    case "p" => Some(pathOrInlineDv)
    case "u" =>
      val prefix = pathOrInlineDv.dropRight(20)
      val uuid = Z85.decodeUuid(pathOrInlineDv.takeRight(20))
      val name = s"deletion_vector_$uuid.bin"
      val rel = if (prefix.isEmpty) name else s"${prefix.stripSuffix("/")}/$name"
      Some(new Path(tablePath, rel).toString)
    case other => throw new IllegalArgumentException(s"unknown DV storageType: $other")
  }

  /** Decode the full deleted-position set. Runs wherever called (driver
    * for commit planning, executors for scan application). */
  def positions(tablePath: String, conf: Configuration): Array[Long] = {
    val data = storageType match {
      case "i" => Z85.decode(pathOrInlineDv, sizeInBytes)
      case _ =>
        val p = new Path(absolutePath(tablePath).get)
        DeletionVectorStore.readBlob(p.getFileSystem(conf), p,
          offset.getOrElse(0), sizeInBytes)
    }
    RoaringBitmapArray.deserialize(data)
  }
}

/**
 * Z85 (ZeroMQ base85) — the alphabet the Delta protocol mandates for
 * UUIDs and inline DVs. 4 bytes -> 5 chars, big-endian.
 */
object Z85 {
  private val alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val decodeMap: Array[Int] = {
    val m = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
    m
  }

  /** Encode; input padded with zero bytes to a multiple of 4 (decoders
    * truncate back via the descriptor's sizeInBytes). */
  def encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ Array.fill[Byte](4 - bytes.length % 4)(0)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  /** Decode to exactly `sizeInBytes` bytes (drops encode padding). */
  def decode(s: String, sizeInBytes: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length must be a multiple of 5: ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = decodeMap(s.charAt(i + j).toInt)
        require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      val base = i / 5 * 4
      out(base) = (v >>> 24).toByte; out(base + 1) = (v >>> 16).toByte
      out(base + 2) = (v >>> 8).toByte; out(base + 3) = v.toByte
      i += 5
    }
    if (sizeInBytes == out.length) out else out.take(sizeInBytes)
  }

  def encodeUuid(uuid: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    encode(bb.array())
  }

  def decodeUuid(s: String): UUID = {
    val bb = ByteBuffer.wrap(decode(s, 16))
    new UUID(bb.getLong, bb.getLong)
  }
}

/**
 * The 64-bit RoaringBitmapArray "portable" serialization the Delta spec
 * fixes for DV payloads: int32 LE magic, int64 LE bitmap count, then per
 * 32-bit sub-bitmap an int32 LE key (the value's high 32 bits) followed
 * by the standard RoaringBitmap portable stream. The reader accepts all
 * three container kinds (array / bitmap / run, cookies 12346 and 12347);
 * the writer emits the run-less form.
 */
object RoaringBitmapArray {
  val Magic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val ArrayMax = 4096

  /** Serialize a set of row positions (need not be sorted or distinct). */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    // group by high-32 key, then by 16-bit container key
    val byKey = sorted.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val parts = byKey.map { case (key, vals) =>
      key -> serialize32(vals.map(v => (v & 0xffffffffL).toInt))
    }
    val total = 4 + 8 + parts.map(4 + _._2.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(parts.size.toLong)
    parts.foreach { case (k, bytes) => bb.putInt(k); bb.put(bytes) }
    bb.array()
  }

  /** One 32-bit roaring bitmap, run-less portable format. `vals` sorted
    * distinct unsigned ints. */
  private def serialize32(vals: Array[Int]): Array[Byte] = {
    val containers: Seq[(Int, Array[Int])] = vals
      .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      .map { case (hi, vs) => hi -> vs.map(_ & 0xffff).sorted }
    val n = containers.size
    val bodySizes = containers.map { case (_, vs) =>
      if (vs.length <= ArrayMax) vs.length * 2 else 8192
    }
    val total = 4 + 4 + 4 * n + 4 * n + bodySizes.sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(CookieNoRun)
    bb.putInt(n)
    containers.foreach { case (hi, vs) =>
      bb.putShort(hi.toShort); bb.putShort((vs.length - 1).toShort)
    }
    var off = 4 + 4 + 4 * n + 4 * n
    bodySizes.foreach { s => bb.putInt(off); off += s }
    containers.foreach { case (_, vs) =>
      if (vs.length <= ArrayMax) vs.foreach(v => bb.putShort(v.toShort))
      else {
        val words = new Array[Long](1024)
        vs.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(bb.putLong)
      }
    }
    bb.array()
  }

  /** Deserialize to the sorted array of set positions. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad DV magic: $magic")
    val nBitmaps = bb.getLong
    val out = Array.newBuilder[Long]
    var b = 0L
    while (b < nBitmaps) {
      val key = bb.getInt.toLong & 0xffffffffL
      deserialize32(bb, v => out += (key << 32) | (v.toLong & 0xffffffffL))
      b += 1
    }
    out.result()
  }

  /** Read one 32-bit roaring bitmap starting at bb's position, advancing
    * past it; emit each set value via `add`. */
  private def deserialize32(bb: ByteBuffer, add: Int => Unit): Unit = {
    val start = bb.position()
    val cookieWord = bb.getInt
    val cookie = cookieWord & 0xffff
    val (n, runFlags) = cookie match {
      case CookieNoRun =>
        (bb.getInt, Array.empty[Byte])
      case CookieRun =>
        val count = (cookieWord >>> 16) + 1
        val flags = new Array[Byte]((count + 7) / 8)
        bb.get(flags)
        (count, flags)
      case other => throw new IllegalArgumentException(s"bad roaring cookie: $other")
    }
    def isRun(i: Int): Boolean =
      runFlags.nonEmpty && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // offset header present when run-less, or run format with >= 4 containers
    val hasOffsets = cookie == CookieNoRun || n >= 4
    val offsets = if (hasOffsets) Array.fill(n)(bb.getInt) else Array.empty[Int]
    i = 0
    while (i < n) {
      if (hasOffsets) bb.position(start + offsets(i))
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val s = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          var v = s
          while (v <= s + len) { add(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= ArrayMax) {
        var c = 0
        while (c < cards(i)) { add(base | (bb.getShort & 0xffff)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          val word = bb.getLong
          if (word != 0) {
            var bit = 0
            while (bit < 64) {
              if ((word & (1L << bit)) != 0) add(base | (w * 64 + bit))
              bit += 1
            }
          }
          w += 1
        }
      }
      i += 1
    }
  }
}

/**
 * The on-disk `.bin` sidecar layout (spec "Deletion Vector File Storage
 * Format"): format-version byte 1, then per DV a big-endian int32 data
 * size, the data (magic + bitmaps, little-endian), and a big-endian
 * int32 CRC-32 of the data. Descriptor offsets point at the size word.
 */
object DeletionVectorStore {

  /** Write one sidecar holding `blobs` in order; returns each blob's
    * (offset, sizeInBytes) for the descriptors. Write-once: sidecars are
    * immutable, a new commit writes a new file. */
  def writeFile(fs: FileSystem, path: Path, blobs: Seq[Array[Byte]]): Seq[(Int, Int)] = {
    val out = new DataOutputStream(fs.create(path, /*overwrite=*/ false))
    try {
      out.writeByte(1)
      var offset = 1
      blobs.map { data =>
        val pos = offset
        out.writeInt(data.length)
        out.write(data)
        val crc = new CRC32
        crc.update(data)
        out.writeInt(crc.getValue.toInt)
        offset += 4 + data.length + 4
        (pos, data.length)
      }
    } finally out.close()
  }

  /** Read + checksum-verify one DV blob. */
  def readBlob(fs: FileSystem, path: Path, offset: Int, sizeInBytes: Int): Array[Byte] = {
    val in = new DataInputStream(fs.open(path))
    try {
      in.skipNBytes(offset.toLong)
      val size = in.readInt()
      require(size == sizeInBytes,
        s"DV size mismatch at $path:$offset — descriptor says $sizeInBytes, file says $size")
      val data = new Array[Byte](size)
      in.readFully(data)
      val stored = in.readInt()
      val crc = new CRC32
      crc.update(data)
      require(stored == crc.getValue.toInt, s"DV checksum mismatch at $path:$offset")
      data
    } finally in.close()
  }
}
