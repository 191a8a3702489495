package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/**
 * Avro data-file reader plugged into Spark's V1 file-scan machinery —
 * the engine's APACHE_AVRO branch (ref
 * `api/.../model/storage/FileFormat.java:26-30` models avro data files;
 * the spark-avro connector is not on this classpath, so the container
 * format is decoded directly with the avro core library). Column
 * pruning applies (only `requiredSchema` fields are converted) and the
 * shared `FileIndex` supplies partition values exactly as for parquet.
 * Whole files are read per task (`isSplitable` = false): avro blocks
 * are sync-marker delimited, but metadata-listed files are written
 * task-sized by this engine, so sub-file splits buy nothing.
 */
final class GraftAvroFileFormat extends FileFormat with Serializable {

  override def inferSchema(
      sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] =
    files.headOption.map { f =>
      val conf = sparkSession.sparkContext.hadoopConfiguration
      graft.schema.AvroSchemaConverters.fromAvro(
        GraftAvroFileFormat.fileSchema(conf, f.getPath))
    }

  override def prepareWrite(
      sparkSession: SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException(
      "avro writes go through graft.sources.AvroDataFiles.write")

  override def isSplitable(
      sparkSession: SparkSession,
      options: Map[String, String],
      path: Path): Boolean = false

  override def buildReader(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val confBc = sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    (file: PartitionedFile) => {
      val path = file.filePath.toPath
      val fs = path.getFileSystem(confBc.value.value)
      val in = fs.open(path)
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      // an early-terminated scan (limit/take/failed stage) abandons the
      // iterator before it drains — close with the task, not just on
      // exhaustion, or every avro file leaks a descriptor
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => stream.close()))
      val converters = requiredSchema.fields.map { sf =>
        val avroField = GraftAvroFileFormat.resolveField(stream.getSchema, sf.name)
        (avroField.map(_.pos()), GraftAvroFileFormat.decoder(sf.dataType))
      }
      val it = new Iterator[InternalRow] {
        private var closed = false
        override def hasNext: Boolean = {
          val h = !closed && stream.hasNext
          if (!h && !closed) { closed = true; stream.close() }
          h
        }
        override def next(): InternalRow = {
          val rec = stream.next()
          val values = new Array[Any](converters.length)
          var i = 0
          while (i < converters.length) {
            val (pos, dec) = converters(i)
            values(i) = pos.map(p => dec(rec.get(p))).orNull
            i += 1
          }
          new GenericInternalRow(values)
        }
      }
      it
    }
  }
}

object GraftAvroFileFormat {

  /** Avro writer schema of a container file. */
  def fileSchema(conf: Configuration, path: Path): Schema = {
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try stream.getSchema finally stream.close()
  }

  /** Spark column name → avro field, honoring the sanitized-name
    * restore prop the schema converter writes. */
  private[graftshim] def resolveField(schema: Schema, sparkName: String): Option[Schema.Field] =
    schema.getFields.asScala.find { f =>
      Option(f.getProp(graft.schema.AvroSchemaConverters.OriginalNameProp))
        .getOrElse(f.name()) == sparkName
    }

  /** Avro runtime value → Catalyst value, driven by the TARGET type
    * (the table schema; files were written through the same converter
    * conventions, ref `AvroSchemaConverter.java:99-267` mappings). */
  private[graftshim] def decoder(dt: DataType): Any => Any = dt match {
    case StringType => {
      case null => null
      case v => UTF8String.fromString(v.toString)
    }
    case IntegerType | DateType => {
      case null => null
      case v: Number => v.intValue()
    }
    case LongType | TimestampType | TimestampNTZType => {
      case null => null
      case v: Number => v.longValue()
    }
    case FloatType => { case null => null; case v: Number => v.floatValue() }
    case DoubleType => { case null => null; case v: Number => v.doubleValue() }
    case BooleanType => identity
    case ShortType => { case null => null; case v: Number => v.shortValue() }
    case ByteType => { case null => null; case v: Number => v.byteValue() }
    case BinaryType => {
      case null => null
      case b: ByteBuffer => bufferBytes(b)
      case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    }
    case d: DecimalType => {
      case null => null
      case b: ByteBuffer =>
        Decimal(new java.math.BigDecimal(new java.math.BigInteger(bufferBytes(b)), d.scale))
      case f: org.apache.avro.generic.GenericFixed =>
        Decimal(new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), d.scale))
    }
    case st: StructType =>
      val fieldDecoders = st.fields.map(f => (f.name, decoder(f.dataType)))
      v => v match {
        case null => null
        case rec: GenericRecord =>
          val values = fieldDecoders.map { case (name, dec) =>
            resolveField(rec.getSchema, name).map(f => dec(rec.get(f.pos()))).orNull
          }
          new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
    case at: ArrayType =>
      val elem = decoder(at.elementType)
      v => v match {
        case null => null
        case coll: java.util.Collection[_] =>
          new GenericArrayData(coll.asScala.map(elem).toArray)
      }
    case mt: MapType =>
      val valueDec = decoder(mt.valueType)
      v => v match {
        case null => null
        case m: java.util.Map[_, _] =>
          val entries = m.asScala.toSeq
          new ArrayBasedMapData(
            new GenericArrayData(entries.map(e => UTF8String.fromString(e._1.toString)).toArray),
            new GenericArrayData(entries.map(e => valueDec(e._2)).toArray))
      }
    case NullType => _ => null
    case other => throw new IllegalArgumentException(s"unsupported avro read type: $other")
  }

  private def bufferBytes(b: ByteBuffer): Array[Byte] = {
    val dup = b.duplicate()
    val out = new Array[Byte](dup.remaining())
    dup.get(out)
    out
  }
}
