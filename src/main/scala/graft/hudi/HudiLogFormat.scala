package graft.hudi

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/**
 * Hudi merge-on-read log files, implemented natively against the public
 * HoodieLogFormat (block layout of `HoodieLogFormatWriter`): per block a
 * 6-byte `#HUDI#` magic, the block length, format version, block type,
 * a header map (int key -> utf8 string), the content length + content,
 * a footer map, and a trailing total-length reverse pointer (for
 * tail-scans). Data rides AVRO_DATA blocks: a version int, a record
 * count, then length-prefixed Avro binary records in the schema the
 * block's SCHEMA header declares. Deletes use the public
 * `_hoodie_is_deleted` tombstone-column convention, which keeps the
 * whole mutation stream in one block type.
 *
 * The reference reads only base files (its MOR sync is the
 * read-optimized view — `core/.../hudi/HudiDataFileExtractor.java`
 * `getLatestBaseFiles`); full log-merge reads are engine surface beyond
 * it.
 */
object HudiLogFormat {

  val Magic: Array[Byte] = "#HUDI#".getBytes(UTF_8)
  val FormatVersion = 1

  // HoodieLogBlockType ordinals
  val CommandBlock = 0
  val DeleteBlock = 1
  val CorruptBlock = 2
  val AvroDataBlock = 3

  // HeaderMetadataType ordinals
  val HeaderInstantTime = 0
  val HeaderTargetInstantTime = 1
  val HeaderSchema = 2
  val HeaderCommandBlockType = 3

  final case class LogBlock(
      blockType: Int,
      headers: Map[Int, String],
      content: Array[Byte])

  /**
   * The EFFECTIVE blocks of one log file — data AND delete blocks, with
   * command-block revocation applied to both. Foreign Hudi writers
   * append more than data blocks, and every extra kind changes results:
   *  - a COMMAND block with a rollback target revokes earlier blocks of
   *    the target instant (appended after a failed mid-append write —
   *    ignoring it would resurrect the failed write's rows); with no
   *    target header it revokes the immediately-preceding block.
   *  - a DELETE block tombstones a key list; callers decode its content
   *    via [[decodeDeleteBlock]] (v3 avro layout decodes; kryo-era
   *    blocks refuse loudly there).
   * Corrupt blocks are unreadable remnants of torn writes: dropped,
   * like Hudi's own reader does.
   */
  def effectiveBlocks(fs: FileSystem, path: Path): Seq[LogBlock] = {
    val out = scala.collection.mutable.ArrayBuffer[LogBlock]()
    readBlocks(fs, path).foreach { b =>
      b.blockType match {
        case AvroDataBlock | DeleteBlock => out += b
        case CommandBlock => b.headers.get(HeaderTargetInstantTime) match {
          case Some(t) =>
            out.filterInPlace(x => !x.headers.get(HeaderInstantTime).contains(t))
          case None => if (out.nonEmpty) out.remove(out.size - 1)
        }
        case _ => // corrupt or unknown: skip
      }
    }
    out.toSeq
  }

  /** Effective DATA blocks only — refuses delete blocks for callers
    * that cannot apply tombstones (skipping one would silently
    * resurrect deleted rows). */
  def dataBlocks(fs: FileSystem, path: Path): Seq[LogBlock] = {
    val eff = effectiveBlocks(fs, path)
    eff.find(_.blockType == DeleteBlock).foreach { b =>
      throw new IllegalStateException(
        s"$path contains a Hudi DELETE log block at instant " +
        s"${b.headers.getOrElse(HeaderInstantTime, "?")} that this read path " +
        "cannot apply. Use a merged (snapshot) read, or compact the table first.")
    }
    eff
  }

  /** Reconstructed from Hudi's public `HoodieDeleteRecordList.avsc`
    * (delete blocks serialize with this schema since format version 3,
    * HUDI-5760 / release 0.14; earlier versions used kryo). */
  val DeleteRecordListSchema: org.apache.avro.Schema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"HoodieDeleteRecordList",
      |"namespace":"org.apache.hudi.avro.model","fields":[
      |{"name":"deleteRecordList","type":{"type":"array","items":
      |{"type":"record","name":"HoodieDeleteRecord","fields":[
      |{"name":"recordKey","type":["null","string"],"default":null},
      |{"name":"partitionPath","type":["null","string"],"default":null},
      |{"name":"orderingVal","type":["null","boolean","int","long","float",
      |"double","bytes","string"],"default":null}]}}}]}""".stripMargin)

  /** Delete-block payload in the v3 (avro) layout:
    * `[int version][int length][binary-avro HoodieDeleteRecordList]`. */
  def encodeDeleteBlock(keys: Seq[(String, String)]): Array[Byte] = {
    val item = DeleteRecordListSchema.getField("deleteRecordList")
      .schema().getElementType
    val list = new GenericData.Record(DeleteRecordListSchema)
    val arr = new GenericData.Array[GenericRecord](keys.size,
      DeleteRecordListSchema.getField("deleteRecordList").schema())
    keys.foreach { case (rk, pp) =>
      val r = new GenericData.Record(item)
      r.put("recordKey", rk)
      r.put("partitionPath", pp)
      arr.add(r)
    }
    list.put("deleteRecordList", arr)
    val recBos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(recBos, null)
    new GenericDatumWriter[GenericRecord](DeleteRecordListSchema).write(list, enc)
    enc.flush()
    val payload = recBos.toByteArray
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(3)
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
    bos.toByteArray
  }

  /** recordKey string → the key column's Spark-typed value (delete
    * blocks carry keys as strings; merged reads tombstone by the typed
    * key column). */
  def keyFromString(rk: String, dt: DataType): Any = dt match {
    case LongType => rk.toLong
    case IntegerType => rk.toInt
    case ShortType => rk.toShort
    case ByteType => rk.toByte
    case DoubleType => rk.toDouble
    case FloatType => rk.toFloat
    case _: DecimalType => new java.math.BigDecimal(rk)
    case BooleanType => rk.toBoolean
    case _ => rk
  }

  /** Decode a delete block's tombstoned `(recordKey, partitionPath)`
    * list. Format version >= 3 decodes via the public avro schema; the
    * kryo-era layouts (versions 1-2) are undecodable without the Hudi
    * runtime and refuse loudly — naming the log file so the user can
    * compact with a Hudi writer. Any malformed payload refuses the same
    * way rather than risk resurrecting or over-deleting rows. */
  def decodeDeleteBlock(content: Array[Byte], where: String): Seq[(String, String)] = {
    def refuse(why: String): Nothing = throw new IllegalStateException(
      s"$where contains a Hudi DELETE log block this engine cannot decode ($why). " +
      "Refusing to read rather than silently resurrect deleted rows — " +
      "compact the table with a Hudi writer first.")
    val in = new DataInputStream(new ByteArrayInputStream(content))
    val version = try in.readInt() catch { case _: java.io.IOException => refuse("truncated") }
    if (version < 3) refuse(s"format version $version serializes keys with kryo")
    try {
      val len = in.readInt()
      val payload = new Array[Byte](len)
      in.readFully(payload)
      val rec = new GenericDatumReader[GenericRecord](DeleteRecordListSchema)
        .read(null, DecoderFactory.get().binaryDecoder(payload, null))
      val arr = rec.get("deleteRecordList").asInstanceOf[java.util.Collection[_]]
      val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
      arr.forEach { itemAny =>
        val item = itemAny.asInstanceOf[GenericRecord]
        val rk = item.get("recordKey")
        if (rk == null) refuse("a delete record carries no recordKey")
        out += ((rk.toString,
          Option(item.get("partitionPath")).map(_.toString).getOrElse("")))
      }
      out.toSeq
    } catch {
      case e: IllegalStateException => throw e
      case scala.util.control.NonFatal(e) =>
        refuse(s"avro payload did not parse: ${e.getClass.getSimpleName}")
    }
  }

  /** `.{fileId}_{baseInstant}.log.{version}_{writeToken}` */
  def logFileName(fileId: String, baseInstant: String, version: Int): String =
    s".${fileId}_$baseInstant.log.${version}_0-0-0"

  private val LogNameRe = """\.(.+)_(\d{14,17})\.log\.(\d+)_.*""".r

  /** (fileId, baseInstant, version) parsed from a log file name. */
  def parseLogFileName(name: String): Option[(String, String, Int)] = name match {
    case LogNameRe(fileId, base, ver) => Some((fileId, base, ver.toInt))
    case _ => None
  }

  def isLogPath(path: String): Boolean = path.contains(".log.")

  // -------------------------------------------------------------- blocks

  private def metadataBytes(m: Map[Int, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val bytes = v.getBytes(UTF_8)
      out.writeInt(k)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  private def readMetadata(in: DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    (0 until n).map { _ =>
      val k = in.readInt()
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      k -> new String(bytes, UTF_8)
    }.toMap
  }

  /** Write `blocks` as a new log file. Always write-once: the rollover
    * naming (a fresh version per commit) means a published log file is
    * never mutated — the object-store-safe discipline (appends aren't
    * atomic, or aren't supported at all, on most stores). */
  def write(fs: FileSystem, path: Path, blocks: Seq[LogBlock]): Long = {
    val out = new DataOutputStream(fs.create(path, false))
    try {
      blocks.foreach { b =>
        val header = metadataBytes(b.headers)
        val footer = metadataBytes(Map.empty)
        // everything after the length field, plus magic+length themselves,
        // lands in the trailing reverse pointer
        val afterLen = 4 + 4 + header.length + 8 + b.content.length + footer.length + 8
        out.write(Magic)
        out.writeLong(afterLen.toLong)
        out.writeInt(FormatVersion)
        out.writeInt(b.blockType)
        out.write(header)
        out.writeLong(b.content.length.toLong)
        out.write(b.content)
        out.write(footer)
        out.writeLong((Magic.length + 8 + afterLen).toLong)
      }
      out.flush()
    } finally out.close()
    fs.getFileStatus(path).getLen
  }

  /** Forward-scan every block of a log file. A torn final block (crashed
    * writer) is dropped, matching Hudi's corrupt-block skipping. */
  def readBlocks(fs: FileSystem, path: Path): Seq[LogBlock] = {
    val st = fs.getFileStatus(path)
    val in = new DataInputStream(fs.open(path))
    val out = Seq.newBuilder[LogBlock]
    try {
      var pos = 0L
      var done = false
      while (!done && pos < st.getLen) {
        try {
          val magic = new Array[Byte](Magic.length)
          in.readFully(magic)
          require(magic.sameElements(Magic), s"bad log magic at $path:$pos")
          val afterLen = in.readLong()
          val version = in.readInt()
          require(version == FormatVersion, s"unsupported log format version $version")
          val blockType = in.readInt()
          val headers = readMetadata(in)
          val contentLen = in.readLong()
          val content = new Array[Byte](contentLen.toInt)
          in.readFully(content)
          readMetadata(in) // footer
          in.readLong() // reverse pointer
          out += LogBlock(blockType, headers, content)
          pos += Magic.length + 8 + afterLen
        } catch {
          case _: EOFException => done = true // torn tail block
        }
      }
    } finally in.close()
    out.result()
  }

  // ------------------------------------------------------ avro data block

  /** AVRO_DATA content: format version, record count, then per record a
    * length-prefixed Avro binary datum. */
  def encodeAvroBlock(schema: Schema, records: Iterator[GenericRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val recBos = new ByteArrayOutputStream()
    val writer = new GenericDatumWriter[GenericRecord](schema)
    var count = 0
    val buffered = records.map { r =>
      recBos.reset()
      val enc = EncoderFactory.get().binaryEncoder(recBos, null)
      writer.write(r, enc)
      enc.flush()
      count += 1
      recBos.toByteArray
    }.toVector
    out.writeInt(3) // HoodieAvroDataBlock content version
    out.writeInt(count)
    buffered.foreach { bytes =>
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  def decodeAvroBlock(content: Array[Byte], schema: Schema): Seq[GenericRecord] = {
    val in = new DataInputStream(new ByteArrayInputStream(content))
    in.readInt() // content version
    val n = in.readInt()
    val reader = new GenericDatumReader[GenericRecord](schema)
    (0 until n).map { _ =>
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
    }
  }

  // ------------------------------------------- flat Row <-> GenericRecord

  /** Spark Row -> Avro record for FLAT schemas (MOR log records; nested
    * types stay on the COW path). */
  def toAvroRecord(row: Row, sparkSchema: StructType, avroSchema: Schema): GenericRecord = {
    val rec = new GenericData.Record(avroSchema)
    sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case DateType =>
            Integer.valueOf(row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
          case TimestampType =>
            val inst = row.getAs[java.sql.Timestamp](i).toInstant
            java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
          case TimestampNTZType =>
            val ldt = row.getAs[java.time.LocalDateTime](i)
            java.lang.Long.valueOf(
              ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
          case d: DecimalType =>
            java.nio.ByteBuffer.wrap(
              row.getAs[java.math.BigDecimal](i).setScale(d.scale).unscaledValue.toByteArray)
          case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
          case _: StructType | _: ArrayType | _: MapType =>
            throw new IllegalArgumentException(
              s"nested column ${f.name} is not supported in MOR log records")
          case _ => row.get(i).asInstanceOf[AnyRef]
        }
      rec.put(f.name, v)
    }
    rec
  }

  /** Avro record -> Row values in `sparkSchema` field order; fields the
    * record lacks (schema drift) read as null. */
  def fromAvroRecord(rec: GenericRecord, sparkSchema: StructType): Row = {
    val values = sparkSchema.fields.map { f =>
      val raw = if (rec.getSchema.getField(f.name) == null) null else rec.get(f.name)
      if (raw == null) null
      else f.dataType match {
        case StringType => raw.toString
        case IntegerType => raw.asInstanceOf[Number].intValue()
        case LongType => raw.asInstanceOf[Number].longValue()
        case ShortType => raw.asInstanceOf[Number].shortValue()
        case ByteType => raw.asInstanceOf[Number].byteValue()
        case DoubleType => raw.asInstanceOf[Number].doubleValue()
        case FloatType => raw.asInstanceOf[Number].floatValue()
        case BooleanType => raw.asInstanceOf[Boolean]
        case DateType =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            raw.asInstanceOf[Number].longValue()))
        case TimestampType =>
          val micros = raw.asInstanceOf[Number].longValue()
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
        case TimestampNTZType =>
          val micros = raw.asInstanceOf[Number].longValue()
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        case d: DecimalType =>
          val bytes = raw match {
            case bb: java.nio.ByteBuffer =>
              val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
            case a: Array[Byte] => a
          }
          new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
        case BinaryType => raw match {
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case a: Array[Byte] => a
        }
        case other =>
          throw new IllegalArgumentException(s"unsupported MOR log type: $other")
      }
    }
    Row.fromSeq(values.toSeq)
  }
}
