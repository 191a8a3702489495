package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroSchemaConvertersSpec extends AnyFunSuite {

  private val nested = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("born", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("ts_ntz", TimestampNTZType, nullable = true),
    StructField("amount", DecimalType(18, 4), nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("props", MapType(StringType, LongType, valueContainsNull = true), nullable = true),
    StructField("address", StructType(Seq(
      StructField("street", StringType, nullable = true),
      StructField("zip", IntegerType, nullable = false))), nullable = true)))

  test("StructType -> Avro -> StructType round-trips") {
    val avro = AvroSchemaConverters.toAvro(nested, "person")
    val back = AvroSchemaConverters.fromAvro(avro)
    assert(back == nested)
  }

  test("nullability maps to [null, T] unions") {
    val avro = AvroSchemaConverters.toAvro(nested, "person")
    val nameField = avro.getField("name").schema()
    assert(nameField.isUnion && nameField.getTypes.size() == 2)
    val idField = avro.getField("id").schema()
    assert(!idField.isUnion)
  }

  test("multi-branch non-null unions are rejected (reference parity)") {
    import org.apache.avro.Schema
    val union = Schema.createUnion(
      Schema.create(Schema.Type.STRING), Schema.create(Schema.Type.LONG))
    val rec = Schema.createRecord("r", null, "ns", false,
      java.util.List.of(new Schema.Field("u", union, null, null)))
    assertThrows[IllegalArgumentException](AvroSchemaConverters.fromAvro(rec))
  }

  test("iceberg schema json round-trips with stable field ids") {
    val withIds = IcebergFixtures.roundtrip(nested)
    assert(withIds.fieldNames.toSeq == nested.fieldNames.toSeq)
  }

  test("avro-illegal column names sanitize and round-trip exactly") {
    import org.apache.spark.sql.types._
    val ugly = StructType(Seq(
      StructField("my-col", StringType),
      StructField("1starts_with_digit", LongType),
      StructField("space name", DoubleType),
      StructField("fine_name", IntegerType)))
    val avro = AvroSchemaConverters.toAvro(ugly)
    // the avro side is legal
    avro.getFields.forEach(f =>
      assert(f.name().matches("[A-Za-z_][A-Za-z0-9_]*"), f.name()))
    // the spark side restores the originals
    assert(AvroSchemaConverters.fromAvro(avro).fieldNames.toSeq ==
      Seq("my-col", "1starts_with_digit", "space name", "fine_name"))
  }
}

private object IcebergFixtures {
  import graft.iceberg.IcebergSchemas
  def roundtrip(st: StructType): StructType = {
    val stamped = IcebergSchemas.assignFieldIds(st)
    val json = IcebergSchemas.toJson(stamped, 0)
    val back = IcebergSchemas.fromJson(json)
    // ids must survive the trip
    stamped.fields.zip(back.fields).foreach { case (a, b) =>
      assert(IcebergSchemas.fieldId(a) == IcebergSchemas.fieldId(b), s"id drift on ${a.name}")
    }
    back
  }
}
