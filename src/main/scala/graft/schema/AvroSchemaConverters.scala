package graft.schema

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Bijective Avro ↔ Spark `StructType` schema conversion — the engine's
 * version of the reference's canonical↔Avro converter (ref
 * `core/.../avro/AvroSchemaConverter.java:77-299` to-canonical,
 * `:301-434` from-canonical). The canonical model here IS `StructType`
 * (SURVEY.md §1.2), so one converter pair replaces the reference's two
 * hops. Follows the same conversion decisions:
 *
 *  - nullability ⇔ `union [null, T]`; multi-branch non-null unions are
 *    rejected, as in the reference (`AvroSchemaConverter.java:244-267`);
 *  - DECIMAL → bytes + decimal logical type with precision/scale
 *    (`:121-135`); DATE → int/date (`:108-113`);
 *  - TIMESTAMP → long/timestamp-micros, TIMESTAMP_NTZ →
 *    long/local-timestamp-micros — Spark 4's native NTZ type removes the
 *    reference's lossy NTZ→long fallback (`DeltaSchemaExtractor.java:52-58`);
 *  - ENUM → string (lossy, reference parity), FIXED → binary;
 *  - map keys must be strings (`:57-66`).
 */
object AvroSchemaConverters {

  // ------------------------------------------------------------ to Avro

  def toAvro(schema: StructType, recordName: String = "record"): Schema =
    structToAvro(schema, recordName, "graft")

  /** Avro names must match `[A-Za-z_][A-Za-z0-9_]*`; Spark columns can
    * be anything. Illegal names are sanitized and the original rides an
    * Avro field prop so the round-trip restores it exactly — the
    * reference's name-convention translation (ref
    * `core/.../hudi/HudiSchemaExtractor.java:56-61`). */
  val OriginalNameProp = "graft.spark.name"

  private[schema] def sanitizeName(n: String): String = {
    val cleaned = n.map(c => if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')
    if (cleaned.isEmpty || cleaned.head.isDigit) s"_$cleaned" else cleaned
  }

  private def structToAvro(st: StructType, name: String, namespace: String): Schema = {
    val used = scala.collection.mutable.Set.empty[String]
    val fields = st.fields.map { f =>
      // disambiguate sanitization collisions ('a-b' and 'a_b' both
      // sanitize to 'a_b') with a numeric suffix; the original name
      // prop restores each exactly
      val base = sanitizeName(f.name)
      val avroName = Iterator.from(0)
        .map(i => if (i == 0) base else s"${base}_$i")
        .find(!used.contains(_)).get
      used += avroName
      val fieldSchema = typeToAvro(f.dataType, f.nullable, s"$namespace.$name", avroName)
      val field = new Schema.Field(avroName, fieldSchema, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      if (avroName != f.name) field.addProp(OriginalNameProp, f.name)
      field
    }
    Schema.createRecord(name, null, namespace, false, fields.toSeq.asJava)
  }

  private def nullable(s: Schema, isNullable: Boolean): Schema =
    if (isNullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s

  private def typeToAvro(dt: DataType, isNullable: Boolean, ns: String, name: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
      case a: ArrayType =>
        Schema.createArray(typeToAvro(a.elementType, a.containsNull, ns, s"${name}_element"))
      case m: MapType =>
        require(m.keyType == StringType, s"avro map keys must be STRING, got ${m.keyType}")
        Schema.createMap(typeToAvro(m.valueType, m.valueContainsNull, ns, s"${name}_value"))
      case s: StructType => structToAvro(s, name, ns)
      case NullType => Schema.create(Schema.Type.NULL)
      case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
    nullable(base, isNullable && dt != NullType)
  }

  // ---------------------------------------------------------- from Avro

  def fromAvro(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"top-level avro schema must be a record")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, isNullable) = typeFromAvro(f.schema())
      val sparkName = Option(f.getProp(OriginalNameProp)).getOrElse(f.name())
      StructField(sparkName, dt, isNullable)
    }.toSeq)
  }

  /** Returns (sparkType, nullable). */
  private def typeFromAvro(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only [null, T] unions are supported (reference parity), got $s")
      val (dt, _) = typeFromAvro(nonNull.head)
      (dt, branches.size > nonNull.size)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
          (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
          (TimestampNTZType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.ENUM => (StringType, false) // lossy, reference parity
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = typeFromAvro(s.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = typeFromAvro(s.getValueType)
      (MapType(StringType, vt, vn), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.map { f =>
        val (dt, n) = typeFromAvro(f.schema())
        // restore the original Spark name at every nesting level
        StructField(Option(f.getProp(OriginalNameProp)).getOrElse(f.name()), dt, n)
      }.toSeq), false)
    case Schema.Type.NULL => (NullType, true)
  }
}
