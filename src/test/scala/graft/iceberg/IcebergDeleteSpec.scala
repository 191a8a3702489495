package graft.iceberg

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Iceberg v2 row-level deletes: position deletes (merge-on-read
  * DELETE), equality deletes (CDC/upsert shape), sequence-number
  * applicability, purge, compaction interaction, and sync-plane guards. */
class IcebergDeleteSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def keys(t: IcebergTable): Seq[Long] =
    t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq

  private def contentCounts(t: IcebergTable): Map[Int, Int] =
    t.scan.files().groupBy(_.content).view.mapValues(_.size).toMap

  test("deleteWhere tombstones by position; time travel unaffected") {
    val dir = tmpDir("ice_del")
    val t = IcebergTable.create(spark, s"$dir/t", orders.repartition(4))
    val all = keys(t)
    val before = t.currentMetadata.currentSnapshotId.get
    t.deleteWhere(col("o_orderkey") % 10 === 0)
    assert(keys(t) == all.filterNot(_ % 10 == 0))
    assert(contentCounts(t).getOrElse(1, 0) > 0) // position-delete entries live
    assert(t.toDF(Some(before)).count() == all.size)
  }

  test("deleteWhere on a partitioned table writes partition-scoped deletes; pruning intact") {
    val dir = tmpDir("ice_del_part")
    val t = IcebergTable.create(spark, s"$dir/t", orders, Seq("o_orderstatus"))
    t.deleteWhere(col("o_orderkey") % 4 === 1)
    val delEntries = t.scan.files().filter(_.content == 1)
    assert(delEntries.nonEmpty)
    assert(delEntries.forall(_.partitionValues.get("o_orderstatus").exists(_ != null)))
    // partition pruning returns exactly the surviving P rows
    val p = t.scan.partitionIn("o_orderstatus", Set("P")).toDF()
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val expect = orders.filter(col("o_orderstatus") === "P" && !(col("o_orderkey") % 4 === 1))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(p == expect)
  }

  test("partitionsDF rolls up data and delete files per partition string") {
    val dir = tmpDir("ice_parts")
    val t = IcebergTable.create(spark, s"$dir/t", orders, Seq("o_orderstatus"))
    val expect = orders.groupBy(col("o_orderstatus")).count().collect()
      .map(r => s"o_orderstatus=${r.getString(0)}" -> r.getLong(1)).toMap
    val parts0 = t.partitionsDF().collect()
    assert(parts0.map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
    assert(parts0.forall(r => r.getLong(2) >= 1 && r.getLong(3) > 0)) // files, bytes
    assert(parts0.forall(_.getLong(4) == 0)) // no delete files yet
    t.deleteWhere(col("o_orderkey") % 4 === 1)
    val parts1 = t.partitionsDF().collect()
    // record_count is the manifests' rollup: position deletes don't
    // rewrite data entries, so counts stand while delete files appear
    assert(parts1.map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
    assert(parts1.exists(_.getLong(4) > 0))
  }

  test("repeated deleteWhere is idempotent under overlap") {
    val dir = tmpDir("ice_del_twice")
    val t = IcebergTable.create(spark, s"$dir/t", orders.repartition(2))
    val all = keys(t)
    t.deleteWhere(col("o_orderkey") % 10 === 0)
    t.deleteWhere(col("o_orderkey") % 15 === 0)
    assert(keys(t) == all.filterNot(k => k % 10 == 0 || k % 15 == 0))
  }

  test("deleteWhere with no match commits nothing") {
    val dir = tmpDir("ice_del_nomatch")
    val t = IcebergTable.create(spark, s"$dir/t", orders)
    val snap = t.currentMetadata.currentSnapshotId.get
    assert(t.deleteWhere(col("o_orderkey") === -1) == snap)
    assert(t.currentMetadata.currentSnapshotId.get == snap)
  }

  test("equality deletes hit only strictly older data files") {
    val dir = tmpDir("ice_eq")
    val t = IcebergTable.create(spark, s"$dir/t", orders.filter(col("o_orderkey") % 2 === 0))
    // delete every key divisible by 4 (they exist in the v1 data)
    val delKeys = orders.filter(col("o_orderkey") % 4 === 0).select("o_orderkey")
    t.deleteByEquality(delKeys)
    // rows appended AFTER the delete carry a newer sequence — not deleted
    t.append(orders.filter(col("o_orderkey") % 4 === 0))
    val expect = (orders.filter(col("o_orderkey") % 2 === 0 && !(col("o_orderkey") % 4 === 0))
      .select("o_orderkey").collect().map(_.getLong(0)) ++
      orders.filter(col("o_orderkey") % 4 === 0).select("o_orderkey").collect().map(_.getLong(0)))
      .sorted.toSeq
    assert(keys(t) == expect)
  }

  test("equality delete null keys match null values") {
    val dir = tmpDir("ice_eq_null")
    import spark.implicits._
    val df = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]))
      .toDF("id", "tag")
    val t = IcebergTable.create(spark, s"$dir/t", df)
    t.deleteByEquality(Seq(Option.empty[String]).toDF("tag"))
    assert(t.toDF().select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("purgeDeletes rewrites only affected files; data identical; sync accepted") {
    val dir = tmpDir("ice_purge")
    val t = IcebergTable.create(spark, s"$dir/t", orders.repartition(3))
    t.deleteWhere(col("o_totalprice") > 200000.0)
    t.deleteByEquality(orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"))
    val expect = keys(t)
    intercept[IllegalArgumentException](t.snapshotDataFiles())
    assert(t.purgeDeletes().nonEmpty)
    assert(keys(t) == expect)
    assert(contentCounts(t).getOrElse(1, 0) == 0)
    assert(contentCounts(t).getOrElse(2, 0) == 0)
    assert(t.snapshotDataFiles().nonEmpty)
    assert(t.purgeDeletes().isEmpty)
  }

  test("compaction materializes deletes without resurrecting rows") {
    val dir = tmpDir("ice_del_compact")
    val t = IcebergTable.create(spark, s"$dir/t", orders.repartition(6))
    t.deleteWhere(col("o_orderkey") % 3 === 0)
    val expect = keys(t)
    assert(t.compact(targetFileBytes = 1L << 30, smallFileBytes = 1L << 30).nonEmpty)
    assert(keys(t) == expect)
    // leftover delete files are inert: rewritten data outranks them
    assert(keys(IcebergTable.forPath(spark, s"$dir/t")) == expect)
  }

  test("incremental changeSet refuses a snapshot that adds delete files") {
    val dir = tmpDir("ice_del_changes")
    val t = IcebergTable.create(spark, s"$dir/t", orders)
    val snap = t.deleteWhere(col("o_orderkey") % 5 === 0)
    intercept[IllegalArgumentException](t.changeSet(snap))
  }

  test("upsert is one snapshot: equality deletes + new data at the same sequence") {
    val dir = tmpDir("ice_upsert")
    val t = IcebergTable.create(spark, s"$dir/t", orders.repartition(3))
    val all = keys(t)
    val snapsBefore = t.snapshotIds.size
    val source = orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .unionByName(orders.limit(5).withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    t.upsert(source, Seq("o_orderkey"))
    assert(t.snapshotIds.size == snapsBefore + 1) // exactly one snapshot
    val now = t.toDF()
    assert(now.count() == all.size + 5)
    val updated = now.filter(col("o_orderkey") % 4 === 0 && col("o_orderkey") < 5000000L)
    assert(updated.count() == all.count(_ % 4 == 0))
    assert(updated.filter(col("o_orderstatus") =!= "U").count() == 0)
    // the upsert's own rows are NOT hit by its deletes (same sequence)
    assert(now.filter(col("o_orderkey") >= 5000000L).count() == 5)
    // a second upsert of the same keys wins over the first
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_orderstatus", lit("V")), Seq("o_orderkey"))
    assert(t.toDF().filter(col("o_orderkey") % 4 === 0 && col("o_orderkey") < 5000000L)
      .filter(col("o_orderstatus") =!= "V").count() == 0)
  }

  test("upsert after deleteWhere: position deletes persist, source keys re-insert") {
    val dir = tmpDir("ice_upsert_after_del")
    val t = IcebergTable.create(spark, s"$dir/t", orders.repartition(2))
    val all = keys(t)
    t.deleteWhere(col("o_orderkey") % 10 === 0)
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_orderstatus", lit("W")), Seq("o_orderkey"))
    assert(keys(t) == all.filter(k => k % 10 != 0 || k % 4 == 0))
    val w = t.toDF().filter(col("o_orderkey") % 4 === 0)
    assert(w.filter(col("o_orderstatus") =!= "W").count() == 0)
    assert(w.count() == all.count(_ % 4 == 0))
  }

  test("changeFeed reports position-delete kills and equality-delete pre-images") {
    val dir = tmpDir("ice_cdf")
    val t = IcebergTable.create(spark, s"$dir/t", orders.repartition(2))
    val s0 = t.currentMetadata.currentSnapshotId.get
    val all = keys(t)
    val s1 = t.deleteWhere(col("o_orderkey") % 10 === 0)
    val s2 = t.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("U")), Seq("o_orderkey"))
    val feed = t.changeFeed(s0, s2)
    // s1: exactly the %10 keys deleted by position
    val d1 = feed.filter(col("_commit_snapshot_id") === s1 && col("_change_type") === "delete")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(d1 == all.filter(_ % 10 == 0))
    // s2: the surviving %7 keys deleted (pre-images) and re-inserted
    val d2 = feed.filter(col("_commit_snapshot_id") === s2 && col("_change_type") === "delete")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(d2 == all.filter(k => k % 7 == 0 && k % 10 != 0))
    val i2 = feed.filter(col("_commit_snapshot_id") === s2 && col("_change_type") === "insert")
    assert(i2.count() == all.count(_ % 7 == 0)) // full source lands as inserts
    assert(i2.filter(col("o_orderstatus") =!= "U").count() == 0)
  }

  test("global equality deletes survive partition pruning") {
    val dir = tmpDir("ice_eq_prune")
    val t = IcebergTable.create(spark, s"$dir/t", orders, Seq("o_orderstatus"))
    t.deleteByEquality(orders.filter(col("o_orderkey") % 3 === 0).select("o_orderkey"))
    // the delete file is unpartitioned (global): a partition-pruned scan
    // must still apply it, not prune it away with the other partitions
    val p = t.scan.partitionIn("o_orderstatus", Set("F")).toDF()
    assert(p.filter(col("o_orderkey") % 3 === 0).count() == 0)
    val expect = orders
      .filter(col("o_orderstatus") === "F" && !(col("o_orderkey") % 3 === 0)).count()
    assert(p.count() == expect)
  }

  test("manifest codec round-trips content and equality ids") {
    val dir = tmpDir("ice_codec")
    val t = IcebergTable.create(spark, s"$dir/t", orders)
    t.deleteByEquality(orders.limit(5).select("o_orderkey"))
    val eq = t.scan.files().filter(_.content == 2)
    assert(eq.nonEmpty)
    assert(eq.head.equalityIds.nonEmpty)
    // bounds on the key column survive for delete-file pruning
    assert(eq.head.lowerBounds.nonEmpty)
  }
}
