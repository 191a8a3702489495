package graft.iceberg

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** rewrite_manifests: manifest-tree consolidation must preserve
  * row-level delete semantics (per-entry sequence numbers), history,
  * and incremental reads. */
class IcebergRewriteManifestsSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def manifestCount(t: IcebergTable): Int =
    IcebergManifests.readManifestList(
      spark.sparkContext.hadoopConfiguration,
      new Path(t.currentMetadata.currentSnapshot.get.manifestList)).size

  test("consolidates to one manifest per content kind; reads and deletes intact") {
    val dir = tmpDir("rw_manifests")
    val o = orders
    val t = IcebergTable.create(spark, s"$dir/t", o.filter(col("o_orderkey") % 4 === 0))
    (1 to 3).foreach(i => t.append(o.filter(col("o_orderkey") % 4 === i)))
    // row-level deletes: position deletes via predicate, then an
    // equality delete — both depend on sequence ordering
    t.deleteWhere(col("o_orderkey") % 10 === 0)
    t.deleteByEquality(o.filter(col("o_orderkey") % 15 === 0).select("o_orderkey"))
    val expect = t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val before = manifestCount(t)
    assert(before > 2, s"fixture should have many manifests, got $before")
    val preRewriteSnap = t.currentMetadata.currentSnapshotId.get

    val snap = t.rewriteManifests()
    assert(snap.nonEmpty)
    assert(manifestCount(t) <= 2)
    assert(t.currentMetadata.currentSnapshot.get.operation == "replace")
    // same rows, deletes still applied (sequence numbers preserved)
    assert(t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq == expect)
    // time travel to the pre-rewrite snapshot still resolves
    assert(t.toDF(snapshotAsOf = Some(preRewriteSnap)).count() == expect.size)
    // a second rewrite is a no-op
    assert(t.rewriteManifests().isEmpty)
    // the manifests metadata table reflects the consolidation
    val m = t.manifestsDF()
    assert(m.count() <= 2)
    assert(m.agg(sum(col("existing_data_files_count"))).head.getLong(0) > 0)
  }

  test("spec-evolved table: rewrite consolidates PER SPEC, old-spec partition values intact") {
    val dir = tmpDir("rw_specevo")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    val t = IcebergTable.create(spark, s"$dir/t",
      src.filter(col("o_orderkey") % 2 === 0), Seq("o_orderstatus"))
    t.evolvePartitionSpec(Seq("o_orderpriority"))
    t.append(src.filter(col("o_orderkey") % 4 === 1))
    t.append(src.filter(col("o_orderkey") % 4 === 3))
    val expect = t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(manifestCount(t) > 2)

    assert(t.rewriteManifests().nonEmpty)
    // one manifest per (content kind, spec), each addressed by ITS spec id
    val list = IcebergManifests.readManifestList(
      spark.sparkContext.hadoopConfiguration,
      new Path(t.currentMetadata.currentSnapshot.get.manifestList))
    assert(list.map(m => (m.content, m.partitionSpecId)).sorted == Seq((0, 0), (0, 1)),
      s"got ${list.map(m => (m.content, m.partitionSpecId))}")
    // rows identical, and BOTH eras' identity partition values survive
    // the rewrite (a single-spec rewrite would drop the old-spec tuples)
    val back = t.toDF()
    assert(back.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq == expect)
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    val files = t.scan.files()
    assert(files.exists(_.partitionValues.contains("o_orderstatus")))
    assert(files.exists(_.partitionValues.contains("o_orderpriority")))
    // old-field pruning still prunes old-spec files and keeps new-spec ones
    val pruned = t.scan.partitionIn("o_orderstatus", Set("O")).files()
    assert(pruned.count(_.partitionValues.contains("o_orderstatus")) <
      files.count(_.partitionValues.contains("o_orderstatus")))
    assert(pruned.count(_.partitionValues.contains("o_orderpriority")) ==
      files.count(_.partitionValues.contains("o_orderpriority")))
    // a second rewrite on the consolidated tree is a no-op
    assert(t.rewriteManifests().isEmpty)
  }

  test("incremental reads across a rewrite do not re-deliver existing files") {
    val dir = tmpDir("rw_incr")
    val o = orders
    val t = IcebergTable.create(spark, s"$dir/t", o.filter(col("o_orderkey") % 2 === 0))
    t.append(o.filter(col("o_orderkey") % 2 === 1))
    val s1 = t.currentMetadata.currentSnapshotId.get
    t.append(o.limit(10).withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    t.rewriteManifests()
    val s3 = t.currentMetadata.currentSnapshotId.get
    // (s1, s3] spans the append (10 rows) and the rewrite (0 rows)
    assert(t.changesAsDF(s1, s3).count() == 10)
    // appends continue on the consolidated head
    t.append(o.limit(5).withColumn("o_orderkey", col("o_orderkey") + 20000000L))
    assert(t.toDF().count() == o.count() + 15)
  }
}
