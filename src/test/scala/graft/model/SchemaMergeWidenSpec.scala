package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-format widening order and its use by additive merge:
  * byte→short→int→long, float→double, decimal precision at the same
  * scale — the intersection of Iceberg spec v2 promotions, Delta
  * typeWidening, and Avro resolution. */
class SchemaMergeWidenSpec extends AnyFunSuite {

  test("widens: the promotion order, strictly") {
    assert(SchemaMerge.widens(ByteType, ShortType))
    assert(SchemaMerge.widens(ByteType, LongType))
    assert(SchemaMerge.widens(ShortType, IntegerType))
    assert(SchemaMerge.widens(IntegerType, LongType))
    assert(SchemaMerge.widens(FloatType, DoubleType))
    assert(SchemaMerge.widens(DecimalType(5, 2), DecimalType(10, 2)))
    // strict, directional, scale-pinned, bounded
    assert(!SchemaMerge.widens(IntegerType, IntegerType))
    assert(!SchemaMerge.widens(LongType, IntegerType))
    assert(!SchemaMerge.widens(DoubleType, FloatType))
    assert(!SchemaMerge.widens(IntegerType, DoubleType)) // not in the iceberg set
    assert(!SchemaMerge.widens(IntegerType, StringType))
    assert(!SchemaMerge.widens(DecimalType(5, 2), DecimalType(10, 3))) // scale change
    assert(!SchemaMerge.widens(DecimalType(10, 2), DecimalType(5, 2)))
    assert(!SchemaMerge.widens(DateType, TimestampType))
  }

  private val ctx = "test-table"

  test("additive: a wider incoming type evolves the declared schema") {
    val ex = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    val in = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    assert(SchemaMerge.additive(ex, in, ctx)("k").dataType == LongType)
  }

  test("additive: a narrower incoming type keeps the declared wide type") {
    val ex = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val in = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    assert(SchemaMerge.additive(ex, in, ctx)("k").dataType == LongType)
  }

  test("additive: unrelated type changes still refuse") {
    val ex = StructType(Seq(StructField("k", IntegerType)))
    val in = StructType(Seq(StructField("k", StringType)))
    val e = intercept[IllegalArgumentException](SchemaMerge.additive(ex, in, ctx))
    assert(e.getMessage.contains("changes type of k"))
  }

  test("additive: widening recurses through arrays, maps, and structs") {
    val ex = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("m", MapType(StringType, IntegerType)),
      StructField("s", StructType(Seq(StructField("x", DecimalType(6, 1)))))))
    val in = StructType(Seq(
      StructField("a", ArrayType(DoubleType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("s", StructType(Seq(StructField("x", DecimalType(12, 1)))))))
    val m = SchemaMerge.additive(ex, in, ctx)
    assert(m("a").dataType == ArrayType(DoubleType))
    assert(m("m").dataType.asInstanceOf[MapType].valueType == LongType)
    assert(m("s").dataType.asInstanceOf[StructType]("x").dataType == DecimalType(12, 1))
  }

  test("additive: map KEY type changes refuse (keys join partitions and indexes)") {
    val ex = StructType(Seq(StructField("m", MapType(IntegerType, StringType))))
    val in = StructType(Seq(StructField("m", MapType(LongType, StringType))))
    intercept[IllegalArgumentException](SchemaMerge.additive(ex, in, ctx))
  }

  test("additive: existing metadata and field order survive a widen") {
    val meta = new MetadataBuilder().putString("marker", "kept").build()
    val ex = StructType(Seq(
      StructField("a", StringType), StructField("k", IntegerType, metadata = meta)))
    val in = StructType(Seq(StructField("k", LongType), StructField("a", StringType)))
    val m = SchemaMerge.additive(ex, in, ctx)
    assert(m.fieldNames.toSeq == Seq("a", "k"))
    assert(m("k").metadata.getString("marker") == "kept")
  }
}
