package graft.hudi

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Record-level index (`record_index` metadata partition, Hudi RFC-37):
 * build scan, distributed replay, write-path maintenance, EXACT upsert
 * routing, and the coverage fence that falls back to col_stats ranges
 * when the index can no longer be trusted.
 */
class HudiRecordIndexSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def abs(table: String, p: String): String =
    if (p.startsWith("/")) p else s"$table/$p"

  test("build + replay: every live key maps to its owning file group, sharded logs") {
    val dir = tmpDir("ri_build")
    // hash-partitioned → interleaved keys, overlapping ranges per file
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(4), "o_orderkey")
    t.buildRecordIndex(numGroups = 4)
    assert(t.recordIndexUsable())
    val idx = HudiMetadataTable.readRecordIndexDF(spark, s"$dir/t").get
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // brute force from the base files themselves
    val slices = t.fileSlices(None)
    val expect = slices.flatMap { s =>
      spark.read.parquet(abs(s"$dir/t", s.basePath)).select("o_orderkey")
        .collect().map(r => r.getLong(0).toString -> s.fileId)
    }.toMap
    assert(idx == expect, s"index has ${idx.size} keys, expected ${expect.size}")
    // entries sharded across group logs, not funneled into one
    val groupFiles = fs.listStatus(
      new Path(s"$dir/t/.hoodie/metadata/record_index")).map(_.getPath.getName)
    assert(groupFiles.count(_.contains("record-index-")) >= 2)
  }

  test("exact routing: only TRUE hit groups are read (ranges overlap, index separates)") {
    val dir = tmpDir("ri_route")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(6), "o_orderkey")
    t.buildRecordIndex()
    val idx = HudiMetadataTable.readRecordIndexDF(spark, s"$dir/t").get
      .collect().map(r => r.getString(0).toLong -> r.getString(2)).toMap
    // pick a victim group and physically delete its base file: any scan
    // touching it fails loudly. Hash-partitioned files have overlapping
    // key ranges, so col_stats range routing could NOT avoid it.
    val victim = t.fileSlices(None).head
    assert(fs.delete(new Path(t.dataRoot, victim.basePath), false) ||
      fs.delete(new Path(victim.basePath), false))
    val otherKeys = idx.filter(_._2 != victim.fileId).keys.take(20).toSeq
    assert(otherKeys.nonEmpty)
    import spark.implicits._
    val src = orders.filter(col("o_orderkey").isInCollection(otherKeys))
      .withColumn("o_totalprice", col("o_totalprice") + 900000.0)
    t.upsert(src) // exact routing never opens the victim
    // updated values visible through the merged read of the touched groups
    val touched = t.fileSlices(None).filter(s => s.fileId != victim.fileId)
    val got = spark.read.parquet(touched.map(s => abs(s"$dir/t", s.basePath)): _*)
    assert(got.count() > 0)
    // a key owned by the victim group forces a read of the missing file
    val victimKeys = idx.filter(_._2 == victim.fileId).keys.take(3).toSeq
    val bad = orders.filter(col("o_orderkey").isInCollection(victimKeys))
    intercept[Exception](t.upsert(bad))
  }

  test("maintenance: inserts and compaction keep the index exact; deletes stay sound") {
    val dir = tmpDir("ri_maint")
    val t = HudiTable.createMor(spark, s"$dir/t",
      orders.filter(col("o_orderkey") % 2 === 0).repartition(3), "o_orderkey")
    t.buildRecordIndex()
    // upsert with updates AND inserts: inserted keys join the index
    val batch = orders.filter(col("o_orderkey") % 4 === 1).limit(50)
      .union(orders.filter(col("o_orderkey") % 2 === 0).limit(50))
    t.upsert(batch)
    assert(t.recordIndexUsable(), "insert-bearing upsert must stay covered")
    val idx1 = HudiMetadataTable.readRecordIndexDF(spark, s"$dir/t").get
    val newKeys = batch.select("o_orderkey").collect().map(_.getLong(0).toString).toSet
    assert(idx1.filter(col("key").isInCollection(newKeys)).count() == newKeys.size)
    // tombstone deletes ride log files — implicitly covered, index stays usable
    t.deleteKeys(orders.filter(col("o_orderkey") % 8 === 0).select("o_orderkey").limit(10))
    assert(t.recordIndexUsable(), "log-only delete must stay covered")
    // compaction rewrites groups: read-back re-maps every moved key
    t.compactMor()
    assert(t.recordIndexUsable(), "compaction must re-cover the index")
    val idx2 = HudiMetadataTable.readRecordIndexDF(spark, s"$dir/t").get
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val liveIds = t.fileSlices(None).map(_.fileId).toSet
    val expect = t.fileSlices(None).flatMap { s =>
      spark.read.parquet(abs(s"$dir/t", s.basePath)).select("o_orderkey")
        .collect().map(r => r.getLong(0).toString -> s.fileId)
    }.toMap
    // every live key maps to its CURRENT group (stale dead-id entries may
    // linger for deleted keys; they are routing-harmless)
    expect.foreach { case (k, fid) =>
      assert(idx2.get(k).contains(fid), s"key $k maps to ${idx2.get(k)}, not $fid") }
    // upserts after compaction still merge correctly (no duplicates)
    t.upsert(orders.filter(col("o_orderkey") % 2 === 0).limit(20)
      .withColumn("o_totalprice", lit(1.5)))
    t.compactMor()
    val dupes = t.toDF().groupBy("o_orderkey").count().filter(col("count") > 1).count()
    assert(dupes == 0, s"$dupes duplicated keys after routed upsert")
    assert(liveIds.nonEmpty)
  }

  test("coverage fence: rollback disables the index, routing falls back and stays correct") {
    val dir = tmpDir("ri_fence")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(3), "o_orderkey")
    t.buildRecordIndex()
    assert(t.recordIndexUsable())
    t.append(orders.limit(10).withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    assert(t.recordIndexUsable(), "append read-back must cover the commit")
    t.rollback()
    assert(!t.recordIndexUsable(), "rollback must fail the fence")
    // upserts still work (col_stats fallback), results correct
    val before = t.toDF().count()
    t.upsert(orders.limit(15).withColumn("o_totalprice", lit(7.0)))
    t.compactMor()
    assert(t.toDF().count() == before)
    assert(t.toDF().filter(col("o_totalprice") === 7.0).count() == 15)
  }

  test("hostile partition values: build scan decodes input_file_name (fuzz seeds 3/14)") {
    // on-disk dirs "part=a b" (space) and "part=pct%2525" (hive-escaped
    // percent) come back from input_file_name() as "a%20b" /
    // "pct%252525" — the build scan must decode before keying files,
    // or every hostile-partition key lookup throws
    val dir = tmpDir("ri_hostile")
    val df = orders.withColumn("part",
      when(col("o_orderkey") % 3 === 0, lit("a b"))
        .when(col("o_orderkey") % 3 === 1, lit("pct%25"))
        .otherwise(lit("x=y")))
    val t = HudiTable.createMor(spark, s"$dir/t", df, "o_orderkey", Seq("part"))
    t.buildRecordIndex()
    assert(t.recordIndexUsable())
    val idx = HudiMetadataTable.readRecordIndexDF(spark, s"$dir/t").get
    assert(idx.count() == orders.count())
    // routed upsert through the hostile layout stays exact
    t.upsert(df.limit(25).withColumn("o_totalprice", lit(8.5)))
    assert(t.toDF().filter(col("o_totalprice") === 8.5).count() == 25)
    assert(t.toDF().count() == orders.count())
  }

  test("fence memo: one timeline JSON walk per new instant, not per routed upsert") {
    val dir = tmpDir("ri_memo")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(3), "o_orderkey")
    t.buildRecordIndex()
    assert(t.recordIndexUsable()) // prime the memo for this timeline state
    val n0 = HudiTable.fenceEvaluations.get()
    (1 to 5).foreach(_ => assert(t.recordIndexUsable()))
    assert(HudiTable.fenceEvaluations.get() == n0,
      "repeated fence checks on an unchanged timeline must not re-walk it")
    // a fresh handle to the same table (new process shape) hits the
    // shared memo too — the key is the table path + timeline state
    assert(HudiTable.forPath(spark, s"$dir/t").recordIndexUsable())
    assert(HudiTable.fenceEvaluations.get() == n0)
    // a new instant changes the key: exactly one new evaluation however
    // many routed upserts follow
    t.upsert(orders.limit(5).withColumn("o_totalprice", lit(3.0)))
    (1 to 3).foreach(_ => assert(t.recordIndexUsable()))
    assert(HudiTable.fenceEvaluations.get() == n0 + 1,
      "a new instant must cost exactly one fence re-evaluation")
    // rollback lands a completed instant too → fresh verdict, not stale
    t.rollback()
    assert(!t.recordIndexUsable(), "rollback must fail the fence through the memo")
  }
}
