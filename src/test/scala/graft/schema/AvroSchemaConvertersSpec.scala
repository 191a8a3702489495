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

  test("nested collection ids are stable across schema evolution") {
    import org.apache.spark.sql.types._
    import graft.iceberg.IcebergSchemas
    val base = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("a", IntegerType),
      StructField("tags", ArrayType(StringType)),
      StructField("kv", MapType(StringType, ArrayType(LongType))))))
    def elementIds(s: StructType): String = {
      val json = IcebergSchemas.toJson(s, 0).toString
      "\"(element|key|value)-id\"\\s*:\\s*(\\d+)".r
        .findAllMatchIn(json).map(_.group(2)).mkString(",")
    }
    val before = elementIds(base)
    // evolution adds a column; previously element ids were re-synthesized
    // from the new max field id and shifted — the spec forbids that
    val evolved = IcebergSchemas.evolveSchema(base,
      StructType(base.fields.map(_.copy(metadata = Metadata.empty)) :+
        StructField("extra", StringType)))
    assert(elementIds(evolved) == before)
    // and the metadata.json round-trip preserves them too
    val back = IcebergSchemas.fromJson(IcebergSchemas.toJson(evolved, 0))
    assert(elementIds(back) == before)
    // the new field's id never collides with an existing collection id
    assert(!before.split(",").map(_.toInt)
      .contains(IcebergSchemas.fieldId(evolved.fields.last).get))
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
