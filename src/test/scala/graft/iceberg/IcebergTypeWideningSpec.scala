package graft.iceberg

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Iceberg type-widening plane: schema-id bumping widenColumn DDL,
  * reads over mixed-width files, pre-widen manifest bounds (4-byte int
  * bounds under a long field) decoding length-aware in the pruning
  * path, time travel under the snapshot's schema, and the refusal
  * matrix (partition-spec sources, non-promotions). */
class IcebergTypeWideningSpec extends SparkTestBase {

  private def items = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    .limit(40)

  test("widenColumn int->long: new schema-id, same field id, files untouched") {
    val dir = tmpDir("iwiden_basic")
    val t = IcebergTable.create(spark, s"$dir/t", items.repartition(2))
    val m0 = t.currentMetadata
    val fid = IcebergSchemas.fieldId(m0.schema("l_linenumber")).get
    val count0 = t.toDF().count()
    t.widenColumn("l_linenumber", LongType)
    val m1 = t.currentMetadata
    assert(m1.currentSchemaId == m0.currentSchemaId + 1)
    assert(m1.schema("l_linenumber").dataType == LongType)
    assert(IcebergSchemas.fieldId(m1.schema("l_linenumber")).contains(fid))
    // the retired schema stays addressable
    assert(m1.allSchemas.toMap.apply(m0.currentSchemaId)("l_linenumber").dataType == IntegerType)
    // no new snapshot, no data movement — reads widen at scan time
    assert(m1.currentSnapshotId == m0.currentSnapshotId)
    assert(t.toDF().count() == count0)
    assert(t.toDF().schema("l_linenumber").dataType == LongType)
  }

  test("pre-widen manifest bounds decode length-aware in the pruning path") {
    val dir = tmpDir("iwiden_bounds")
    val t = IcebergTable.create(spark, s"$dir/t", items.limit(10).repartition(2))
    t.widenColumn("l_linenumber", LongType)
    // post-widen append carries 8-byte bounds; the pre-widen manifests
    // carry 4-byte bounds — BOTH must decode in one pruned scan
    t.append(items.limit(3)
      .withColumn("l_orderkey", col("l_orderkey") + 2000000L)
      .withColumn("l_linenumber", lit(4000000000L)))
    val all = t.scan.files()
    // range above int max keeps only the wide file(s): old 4-byte
    // bounds must decode (not BufferUnderflow) AND prune
    val wide = t.scan.range("l_linenumber", Some(3999999999L), None).files()
    assert(wide.nonEmpty && wide.size < all.size)
    val rows = t.toDF().select("l_linenumber").collect().map(_.getLong(0))
    assert(rows.length == 13 && rows.count(_ == 4000000000L) == 3)
    // a range that matches the narrow files keeps them
    val narrow = t.scan.range("l_linenumber", None, Some(10L)).files()
    assert(narrow.size == all.size - wide.size)
  }

  test("time travel: snapshots before the widen present the narrow schema") {
    val dir = tmpDir("iwiden_tt")
    val t = IcebergTable.create(spark, s"$dir/t", items.limit(10))
    val snap0 = t.currentMetadata.currentSnapshotId.get
    t.widenColumn("l_linenumber", LongType)
    t.append(items.limit(2).withColumn("l_orderkey", col("l_orderkey") + 9000000L))
    assert(t.toDF(Some(snap0)).schema("l_linenumber").dataType == IntegerType)
    assert(t.toDF().schema("l_linenumber").dataType == LongType)
    assert(t.toDF(Some(snap0)).count() == 10)
  }

  test("appends after the widen: narrower batches keep the declared wide type") {
    val dir = tmpDir("iwiden_app")
    val t = IcebergTable.create(spark, s"$dir/t", items.limit(10))
    t.widenColumn("l_linenumber", LongType)
    val sid = t.currentMetadata.currentSchemaId
    t.append(items.limit(5).withColumn("l_orderkey", col("l_orderkey") + 1000000L))
    assert(t.currentMetadata.currentSchemaId == sid) // no flip-flop
    assert(t.currentMetadata.schema("l_linenumber").dataType == LongType)
    assert(t.toDF().count() == 15)
  }

  test("v2 deletes across the widen: narrow key batches align to the declared width") {
    val dir = tmpDir("iwiden_del")
    // narrow files first, then the widen, then an equality delete whose
    // key batch is STILL int-typed (a late narrow writer): the delete
    // file must carry the declared long width — the reader's delete
    // schema and the manifest bound codec both follow the table schema
    val t = IcebergTable.create(spark, s"$dir/t", items.limit(10))
    val keys = items.limit(10).select("l_orderkey").collect().map(_.getLong(0)).sorted
    t.widenColumn("l_linenumber", LongType)
    import spark.implicits._
    // delete two rows by an int-typed l_linenumber predicate column pair
    val victim = items.limit(10).filter(col("l_orderkey") === keys.head)
      .select(col("l_orderkey"), col("l_linenumber")).collect().head
    t.deleteByEquality(Seq((victim.getLong(0), victim.getInt(1)))
      .toDF("l_orderkey", "l_linenumber")) // l_linenumber is INT here
    assert(t.toDF().count() == 9)
    assert(!t.toDF().select("l_orderkey").collect().map(_.getLong(0)).contains(victim.getLong(0)))
    // upsert post-widen with a narrow batch: keys align, rows replace
    val up = items.limit(10).filter(col("l_orderkey") === keys.last)
      .withColumn("l_returnflag", lit("Z"))
    t.upsert(up, Seq("l_orderkey"))
    val flags = t.toDF().filter(col("l_orderkey") === keys.last)
      .select("l_returnflag").collect().map(_.getString(0))
    assert(flags.nonEmpty && flags.forall(_ == "Z"))
    // a batch WIDER than a declared column refuses, naming widenColumn
    val e = intercept[IllegalArgumentException](t.deleteByEquality(
      Seq((1L, BigDecimal(2))).toDF("l_orderkey", "l_linenumber")))
    assert(e.getMessage.contains("widen the table first"))
  }

  test("refusal matrix: partition-spec sources and non-promotions") {
    val dir = tmpDir("iwiden_refuse")
    val t = IcebergTable.create(spark, s"$dir/t", items.limit(20), Seq("l_linenumber"))
    intercept[IllegalArgumentException](t.widenColumn("l_linenumber", LongType))
    intercept[IllegalArgumentException](t.widenColumn("l_returnflag", LongType))
    intercept[IllegalArgumentException](t.widenColumn("l_orderkey", IntegerType))
    intercept[IllegalArgumentException](t.widenColumn("nope", LongType))
    // a RETIRED spec's source is still pinned (old manifests keep its
    // typed partition values)
    val t2 = IcebergTable.create(spark, s"$dir/t2", items.limit(20), Seq("l_linenumber"))
    t2.evolvePartitionSpec(Seq("l_returnflag"))
    intercept[IllegalArgumentException](t2.widenColumn("l_linenumber", LongType))
  }

  test("evolveSchema: widen keeps the id, narrower keeps wide, unrelated change re-ids") {
    val ex = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    val widened = IcebergSchemas.evolveSchema(ex,
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))))
    assert(widened("a").dataType == LongType)
    assert(IcebergSchemas.fieldId(widened("a")) == IcebergSchemas.fieldId(ex("a")))
    val kept = IcebergSchemas.evolveSchema(
      IcebergSchemas.assignFieldIds(StructType(Seq(StructField("a", LongType)))),
      StructType(Seq(StructField("a", IntegerType))))
    assert(kept("a").dataType == LongType)
    // a non-promotion type change under the SAME name is a drop+add
    // (deletes-first): the old id retires, the new column gets a FRESH
    // id — old manifests' bounds are never decoded under the new type
    val swapped = IcebergSchemas.evolveSchema(ex,
      StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
    assert(swapped("a").dataType == StringType)
    assert(IcebergSchemas.fieldId(swapped("a")) != IcebergSchemas.fieldId(ex("a")))
    assert(IcebergSchemas.fieldId(swapped("a")).get > IcebergSchemas.fieldId(ex("b")).get)
    assert(IcebergSchemas.fieldId(swapped("b")) == IcebergSchemas.fieldId(ex("b")))
    // idempotent: re-applying the same incoming schema changes nothing
    assert(IcebergSchemas.evolveSchema(swapped,
      StructType(Seq(StructField("a", StringType), StructField("b", StringType)))).json
      == swapped.json)
  }
}
