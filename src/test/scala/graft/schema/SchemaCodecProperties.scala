package graft.schema

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.delta.DeltaStats
import graft.iceberg.IcebergSchemas
import graft.model.ColumnStatRow
import graft.stats.FileFooterStats

/**
 * Property round-trips for the three schema codecs over arbitrary nested
 * StructTypes — the adoption item SURVEY.md §5 calls out as an upgrade
 * over the reference's example-based converter tests (ref
 * `core/src/test/java/io/onetable/avro/TestAvroSchemaConverter.java`,
 * `TestIcebergSchemaExtractor.java`, `TestDeltaStatsExtractor.java`).
 * Runs under sbt via ScalaCheck's own test framework; no SparkSession.
 */
object SchemaCodecProperties extends Properties("SchemaCodecs") {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------ generators

  /** Primitive types every codec represents losslessly (Byte/Short
    * deliberately excluded: both codecs widen them to int, the same
    * lossy mapping the reference makes). */
  private val primGen: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType, StringType,
    BinaryType, DateType, TimestampType, TimestampNTZType,
    DecimalType(5, 0), DecimalType(10, 2), DecimalType(38, 18))

  /** Names exercise the sanitizer: plain identifiers, reserved-ish
    * shapes, leading digits, spaces, symbols, unicode. */
  private val nameGen: Gen[String] = Gen.frequency(
    4 -> Gen.alphaLowerStr.map(s => "f" + s.take(8)),
    1 -> Gen.oneOf("a b", "a-b", "a_b", "a+b", "0col", "col$", "naïve", "_1", "a.b"),
    1 -> Gen.choose(1, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ Seq('-', ' ', '%')))))

  /** Distinct by construction: repeats get an index suffix ('~' never
    * appears in nameGen output, so suffixed names cannot collide). */
  private def distinctNames(n: Int): Gen[List[String]] =
    Gen.listOfN(n, nameGen).map(_.zipWithIndex.map { case (s, i) =>
      val base = if (s.nonEmpty) s else "f"
      base + (if (i == 0) "" else s"~$i")
    })

  private def typeGen(depth: Int, mapKey: Gen[DataType]): Gen[DataType] =
    if (depth <= 0) primGen
    else Gen.frequency(
      6 -> primGen,
      1 -> Gen.lzy(for {
        et <- typeGen(depth - 1, mapKey); n <- Gen.oneOf(true, false)
      } yield ArrayType(et, n)),
      1 -> Gen.lzy(for {
        kt <- mapKey; vt <- typeGen(depth - 1, mapKey); n <- Gen.oneOf(true, false)
      } yield MapType(kt, vt, n)),
      1 -> Gen.lzy(structGen(depth - 1, mapKey)))

  private def structGen(depth: Int, mapKey: Gen[DataType]): Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    names <- distinctNames(n)
    types <- Gen.listOfN(n, typeGen(depth, mapKey))
    nulls <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield StructType(names.lazyZip(types).lazyZip(nulls).map(StructField(_, _, _)))

  /** Avro map keys must be strings (ref `AvroSchemaConverter.java:57-66`). */
  private val avroSchemaGen: Gen[StructType] = structGen(3, Gen.const(StringType))
  /** Iceberg codec accepts string/int/long map keys. */
  private val icebergSchemaGen: Gen[StructType] =
    structGen(3, Gen.oneOf(StringType, IntegerType, LongType))

  // --------------------------------------------------------- avro codec

  property("avro round-trip preserves names, types, nullability") =
    forAll(avroSchemaGen) { s =>
      AvroSchemaConverters.fromAvro(AvroSchemaConverters.toAvro(s)) == s
    }

  private val AvroName = "[A-Za-z_][A-Za-z0-9_]*".r
  property("emitted avro names are always legal") = forAll(avroSchemaGen) { s =>
    def legal(sch: org.apache.avro.Schema): Boolean = {
      import scala.jdk.CollectionConverters._
      sch.getType match {
        case org.apache.avro.Schema.Type.RECORD =>
          sch.getFields.asScala.forall(f =>
            AvroName.matches(f.name()) && legal(f.schema()))
        case org.apache.avro.Schema.Type.UNION => sch.getTypes.asScala.forall(legal)
        case org.apache.avro.Schema.Type.ARRAY => legal(sch.getElementType)
        case org.apache.avro.Schema.Type.MAP => legal(sch.getValueType)
        case _ => true
      }
    }
    legal(AvroSchemaConverters.toAvro(s))
  }

  // ------------------------------------------------------ iceberg codec

  /** Keep only what the wire format carries: names, types, nullability,
    * field ids, collection ids. (The in-memory form also stamps a
    * shape-signature key used for id reuse decisions; it is derivable.) */
  private def icebergNormalize(s: StructType): StructType = StructType(s.fields.map { f =>
    val mb = new MetadataBuilder()
    f.metadata.getLong(IcebergSchemas.FieldIdKey) // throws if absent — ids must exist
    mb.putLong(IcebergSchemas.FieldIdKey, f.metadata.getLong(IcebergSchemas.FieldIdKey))
    if (f.metadata.contains(IcebergSchemas.CollIdsKey))
      mb.putString(IcebergSchemas.CollIdsKey, f.metadata.getString(IcebergSchemas.CollIdsKey))
    StructField(f.name, icebergNormalizeType(f.dataType), f.nullable, mb.build())
  })
  private def icebergNormalizeType(dt: DataType): DataType = dt match {
    case s: StructType => icebergNormalize(s)
    case a: ArrayType => a.copy(elementType = icebergNormalizeType(a.elementType))
    case m: MapType => m.copy(valueType = icebergNormalizeType(m.valueType))
    case other => other
  }

  property("iceberg json round-trip preserves structure and every id") =
    forAll(icebergSchemaGen) { s =>
      val stamped = IcebergSchemas.assignFieldIds(s)
      val back = IcebergSchemas.fromJson(
        mapper.readTree(IcebergSchemas.toJson(stamped, 0).toString))
      Prop.all(
        Prop(icebergNormalize(back) == icebergNormalize(stamped)) :| "structure+ids",
        Prop(IcebergSchemas.lastColumnId(back) == IcebergSchemas.lastColumnId(stamped))
          :| "last-column-id")
    }

  property("iceberg field ids are unique and dense from 1") =
    forAll(icebergSchemaGen) { s =>
      val stamped = IcebergSchemas.assignFieldIds(s)
      def collIds(f: StructField): Seq[Int] =
        if (f.metadata.contains(IcebergSchemas.CollIdsKey))
          f.metadata.getString(IcebergSchemas.CollIdsKey)
            .split(",").filter(_.nonEmpty).map(_.toInt).toSeq
        else Seq.empty
      def ids(st: StructType): Seq[Int] = st.fields.toSeq.flatMap { f =>
        (f.metadata.getLong(IcebergSchemas.FieldIdKey).toInt +: collIds(f)) ++
          nestedIds(f.dataType)
      }
      def nestedIds(dt: DataType): Seq[Int] = dt match {
        case st: StructType => ids(st)
        case a: ArrayType => nestedIds(a.elementType)
        case m: MapType => nestedIds(m.valueType)
        case _ => Seq.empty
      }
      val all = ids(stamped)
      all.distinct.size == all.size && all.sorted == (1 to all.size)
    }

  property("iceberg evolution keeps existing ids stable, never reuses") =
    forAll(icebergSchemaGen, icebergSchemaGen) { (a, b) =>
      val base = IcebergSchemas.assignFieldIds(a)
      val evolved = IcebergSchemas.evolveSchema(base, b)
      def idByName(st: StructType): Map[String, Int] =
        st.fields.map(f => f.name -> f.metadata.getLong(IcebergSchemas.FieldIdKey).toInt).toMap
      val baseIds = idByName(base)
      val evolvedIds = idByName(evolved)
      val inTypes = b.fields.map(f => f.name -> f.dataType).toMap
      val baseTypes = base.fields.map(f => f.name -> f.dataType).toMap
      val last = IcebergSchemas.lastAssignedId(base)
      // same-type fields MUST keep their id; a type change along the
      // promotion order (either direction — a wider incoming widens,
      // a narrower incoming keeps the declared wide type) MUST keep the
      // id; an incompatible change MUST be re-idd as a drop+add with a
      // FRESH id above every previously assigned one — never a reuse.
      // (The r12 relaxed either-or form could catch neither a promotion
      // that wrongly re-ids nor an incompatible change that reuses.)
      import graft.model.SchemaMerge
      // the spec's compatibility relation: promotions keep the id in
      // EITHER direction; a struct keeps its OUTER id whatever happened
      // inside (inner incompatibilities re-id the inner field);
      // containers follow their interiors
      def keepsId(a: DataType, b: DataType): Boolean = (a, b) match {
        case (_: StructType, _: StructType) => true
        case (x: ArrayType, y: ArrayType) => keepsId(x.elementType, y.elementType)
        case (x: MapType, y: MapType) =>
          x.keyType == y.keyType && keepsId(x.valueType, y.valueType)
        case (x, y) => x == y || SchemaMerge.widens(x, y) || SchemaMerge.widens(y, x)
      }
      val stable = baseIds.keySet.intersect(evolvedIds.keySet).forall { n =>
        if (keepsId(baseTypes(n), inTypes(n))) baseIds(n) == evolvedIds(n)
        else evolvedIds(n) > last
      }
      val fresh = (evolvedIds.keySet -- baseIds.keySet)
        .forall(n => evolvedIds(n) > last)
      stable && fresh
    }

  property("iceberg evolution is idempotent: re-applying the same incoming schema is a no-op") =
    forAll(icebergSchemaGen, icebergSchemaGen) { (a, b) =>
      val base = IcebergSchemas.assignFieldIds(a)
      val once = IcebergSchemas.evolveSchema(base, b)
      val twice = IcebergSchemas.evolveSchema(once, b)
      once.json == twice.json
    }

  property("iceberg evolution: a dropped-then-readded column gets a FRESH id (deletes-first)") =
    forAll(icebergSchemaGen) { a =>
      // a duplicate of the victim's name surviving the drop would keep
      // the name alive — only distinct-name schemas exercise the claim
      if (a.fields.length < 2 || a.fieldNames.distinct.length != a.fields.length) true
      else {
        val base = IcebergSchemas.assignFieldIds(a)
        val victim = base.fields.head
        val victimId = victim.metadata.getLong(IcebergSchemas.FieldIdKey).toInt
        // replay with the persisted last-column-id as the floor, the way
        // the table does: drop the column, then re-add the name + type
        val lastId = IcebergSchemas.lastAssignedId(base)
        val dropped = IcebergSchemas.evolveSchema(base, StructType(a.fields.tail), lastId)
        val readded = IcebergSchemas.evolveSchema(
          dropped, StructType(dropped.fields.map(f => f.copy(metadata = Metadata.empty)) :+
            victim.copy(metadata = Metadata.empty)),
          math.max(lastId, IcebergSchemas.lastAssignedId(dropped)))
        val newId = readded.fields.last.metadata.getLong(IcebergSchemas.FieldIdKey).toInt
        newId != victimId && newId > lastId
      }
    }

  // -------------------------------------------------- delta stats codec

  private def statValueGen(dt: DataType): Gen[String] = dt match {
    case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue).map(_.toString)
    case LongType => Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString)
    case DoubleType => Gen.choose(-1e12, 1e12).map(_.toString)
    case FloatType => Gen.choose(-1e6f, 1e6f).map(_.toString)
    case BooleanType => Gen.oneOf("true", "false")
    case d: DecimalType =>
      Gen.choose(-1000000L, 1000000L).map(u =>
        java.math.BigDecimal.valueOf(u, d.scale).toPlainString)
    case TimestampType | TimestampNTZType =>
      // Delta stats serialize at millisecond precision (ISO-8601 .SSS),
      // matching the reference's formatter (ref DeltaValueConverter.java:45-55)
      Gen.choose(-62135596800000L, 253402300799000L / 1000).map(ms => (ms * 1000).toString)
    case DateType => Gen.choose(-719162L, 2932896L).map(_.toString)
    case StringType => Gen.asciiPrintableStr.map(_.take(20))
    case other => sys.error(s"no stat gen for $other")
  }

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType, StringType,
    DateType, TimestampType, DecimalType(12, 3))

  private val statsCaseGen: Gen[(StructType, FileFooterStats)] = for {
    n <- Gen.choose(1, 6)
    names <- distinctNames(n)
    types <- Gen.listOfN(n, scalarGen)
    fields = names.zip(types).map { case (nm, t) => StructField(nm, t, nullable = true) }
    rows <- Gen.choose(0L, 1000000L)
    cols <- Gen.sequence[List[ColumnStatRow], ColumnStatRow](fields.map { f =>
      for {
        mn <- statValueGen(f.dataType)
        mx <- statValueGen(f.dataType)
        nulls <- Gen.choose(0L, rows)
      } yield ColumnStatRow(f.name, Some(mn), Some(mx), nulls, rows, 0L)
    })
  } yield (StructType(fields), FileFooterStats("f", 1L, rows, 0L, cols))

  /** Values compare under their type's semantics — string forms may
    * legitimately differ (e.g. float "1.0E6" vs "1000000.0"). */
  private def sameValue(dt: DataType, a: String, b: String): Boolean = dt match {
    case FloatType => a.toFloat == b.toFloat
    case DoubleType => a.toDouble == b.toDouble
    case _: DecimalType => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) == 0
    case _ => a == b
  }

  property("delta stats json round-trips every scalar column") =
    forAll(statsCaseGen) { case (schema, stats) =>
      val (rows, cols) = DeltaStats.fromJson(DeltaStats.toJson(stats, schema), schema)
      val byName = cols.map(c => c.column -> c).toMap
      Prop.all(
        Prop(rows == stats.recordCount) :| "numRecords",
        Prop(stats.columns.forall { orig =>
          byName.get(orig.column).exists { back =>
            sameValue(schema(orig.column).dataType, back.minValue.get, orig.minValue.get) &&
              sameValue(schema(orig.column).dataType, back.maxValue.get, orig.maxValue.get) &&
              back.numNulls == orig.numNulls
          }
        }) :| "per-column min/max/nulls")
    }
}
