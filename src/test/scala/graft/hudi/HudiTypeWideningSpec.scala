package graft.hudi

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Hudi type widening: the widened schema rides a zero-write commit's
  * extraMetadata (the schema-evolution channel), old base files read
  * widened, and the record-key / partition-column refusals hold. */
class HudiTypeWideningSpec extends SparkTestBase {

  private def items = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    .limit(40)

  test("widenColumn is a zero-write commit; old files read widened") {
    val dir = tmpDir("hwiden_basic")
    val t = HudiTable.create(spark, s"$dir/t", items.limit(10).repartition(2))
    val instants0 = t.timeline.completedInstants().size
    val instant = t.widenColumn("l_linenumber", LongType)
    assert(t.timeline.completedInstants().size == instants0 + 1)
    // the widen instant carries no writes
    val meta = t.timeline.readCommitMetadata(
      t.timeline.completedInstants().find(_.time == instant).get)
    assert(meta.partitionToWriteStats.isEmpty && meta.operationType == "ALTER_SCHEMA")
    assert(t.schemaAt(None)("l_linenumber").dataType == LongType)
    assert(t.toDF().schema("l_linenumber").dataType == LongType)
    assert(t.toDF().count() == 10)
  }

  test("appends after the widen: wide values land, narrow writers keep working") {
    val dir = tmpDir("hwiden_app")
    val t = HudiTable.create(spark, s"$dir/t", items.limit(10))
    t.widenColumn("l_linenumber", LongType)
    t.append(items.limit(3)
      .withColumn("l_orderkey", col("l_orderkey") + 2000000L)
      .withColumn("l_linenumber", lit(4000000000L)))
    // a still-int writer after the widen: declared type stays long
    t.append(items.limit(2).withColumn("l_orderkey", col("l_orderkey") + 5000000L))
    assert(t.schemaAt(None)("l_linenumber").dataType == LongType)
    val got = t.toDF().select("l_linenumber").collect().map(_.getLong(0))
    assert(got.length == 15 && got.count(_ == 4000000000L) == 3)
  }

  test("time travel: instants before the widen present the narrow schema") {
    val dir = tmpDir("hwiden_tt")
    val t = HudiTable.create(spark, s"$dir/t", items.limit(10))
    val before = t.timeline.completedInstants().last.time
    t.widenColumn("l_linenumber", LongType)
    assert(t.schemaAt(Some(before))("l_linenumber").dataType == IntegerType)
    assert(t.schemaAt(None)("l_linenumber").dataType == LongType)
  }

  test("MOR: narrow log blocks merge under the widened schema; compaction carries it") {
    val dir = tmpDir("hwiden_mor")
    // keyed MOR: base files written narrow (int), then the widen, then
    // an upsert whose LOG BLOCKS carry wide values and another whose
    // blocks are still narrow — the merged snapshot read presents all
    // three generations under the wide schema, exactly
    val t = HudiTable.createMor(spark, s"$dir/t", items.limit(10), "l_orderkey")
    t.widenColumn("l_linenumber", LongType)
    val keys = items.limit(10).select("l_orderkey").collect().map(_.getLong(0)).sorted
    // wide update of 3 existing keys (beyond int range)
    t.upsert(items.limit(10).filter(col("l_orderkey").isin(keys.take(3): _*))
      .withColumn("l_linenumber", lit(4000000000L)))
    // narrow late writer updates 2 other keys
    t.upsert(items.limit(10).filter(col("l_orderkey").isin(keys.slice(3, 5): _*))
      .withColumn("l_linenumber", lit(7)))
    val merged = t.toDF()
    assert(merged.schema("l_linenumber").dataType == LongType)
    assert(merged.count() == 10)
    val byKey = merged.select("l_orderkey", "l_linenumber").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.take(3).foreach(k => assert(byKey(k) == 4000000000L, s"key $k"))
    keys.slice(3, 5).foreach(k => assert(byKey(k) == 7L, s"key $k"))
    // compaction folds the mixed-width log blocks into wide base files
    t.compactMor()
    val compacted = t.toDF()
    assert(compacted.schema("l_linenumber").dataType == LongType)
    assert(compacted.select("l_orderkey", "l_linenumber").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == byKey)
  }

  test("refusal matrix: record key, partition column, non-promotions") {
    val dir = tmpDir("hwiden_refuse")
    val t = HudiTable.create(spark, s"$dir/t",
      items.limit(20).withColumn("key_int", (col("l_orderkey") * 10).cast("int")),
      Seq("l_returnflag"))
    intercept[IllegalArgumentException](t.widenColumn("l_returnflag", LongType))
    intercept[IllegalArgumentException](t.widenColumn("l_orderkey", IntegerType))
    intercept[IllegalArgumentException](t.widenColumn("nope", LongType))
    // keyed table: the record key's serialized form is pinned
    val dirK = tmpDir("hwiden_keyed")
    val tk = HudiTable.create(spark, s"$dirK/t",
      items.limit(5).withColumn("key_int", (col("l_orderkey") * 10).cast("int")))
    tk.timeline.writeProperties(
      tk.properties + ("hoodie.table.recordkey.fields" -> "key_int"))
    val e = intercept[IllegalArgumentException](tk.widenColumn("key_int", LongType))
    assert(e.getMessage.contains("record key"))
    // non-key columns of the keyed table still widen
    tk.widenColumn("l_linenumber", LongType)
    assert(tk.schemaAt(None)("l_linenumber").dataType == LongType)
  }
}
