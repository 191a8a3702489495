package graft.sync

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable

/**
 * Pinned regressions shrunk from CrossFormatFuzzSpec failures (seed 7,
 * round 8). Two independent bugs in one sequence:
 *  1. IcebergTable.changeSet emitted percent-ENCODED remove paths
 *     (toUri.toString), so targets kept replaced files in escapable
 *     partitions after an overwrite replay.
 *  2. a Hudi target kept its original hoodie.table.partition.fields when
 *     the source's partition spec evolved, so it misparsed the new
 *     layout's paths (old field got the raw `status=X` segment, the new
 *     partition column read null).
 */
class SpecEvolveChainRegressionSpec extends SparkTestBase {

  private def pool = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(
      col("o_orderkey").as("k"),
      col("o_totalprice").as("price"),
      col("o_orderstatus").as("status"),
      element_at(
        map(lit("1-URGENT"), lit("urgent"), lit("2-HIGH"), lit("a b"),
          lit("3-MEDIUM"), lit("x=y"), lit("4-NOT SPECIFIED"), lit("pct%25"),
          lit("5-LOW"), lit("dot.:colon")),
        col("o_orderpriority")).as("part"))
    .localCheckpoint()

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val cs = a.columns.sorted.toSeq.map(c => col(s"`$c`"))
    val (al, bl) = (a.select(cs: _*), b.select(cs: _*))
    assert(al.exceptAll(bl).isEmpty && bl.exceptAll(al).isEmpty,
      s"$what diverged: src-only=${al.exceptAll(bl).limit(3).collect().mkString("|")} " +
        s"tgt-only=${bl.exceptAll(al).limit(3).collect().mkString("|")}")
  }

  test("overwrite replay removes files in escapable partitions (decoded remove paths)") {
    val dir = tmpDir("regr_ow_escape")
    val t = IcebergTable.create(spark, s"$dir/src", pool.filter(col("k") % 3 === 0), Seq("part"))
    SyncEngine.sync(SyncEngine.icebergSource(t), SyncEngine.targetFor(spark, "delta", s"$dir/a"))
    t.overwrite(pool.filter(col("k") % 2 === 0))
    val res = SyncEngine.sync(
      SyncEngine.icebergSource(t), SyncEngine.targetFor(spark, "delta", s"$dir/a"))
    assert(res.mode == "incremental" && res.filesRemoved > 0)
    assertSame(t.toDF(), DeltaTable.forPath(spark, s"$dir/a").toDF(), "overwrite replay")
  }

  test("partition-spec evolution propagates through chain iceberg->delta->hudi") {
    val dir = tmpDir("regr_specevo")
    val t = IcebergTable.create(spark, s"$dir/src", pool.filter(col("k") % 3 === 0), Seq("part"))
    def syncAll(): Unit = {
      SyncEngine.sync(SyncEngine.icebergSource(t), SyncEngine.targetFor(spark, "delta", s"$dir/a"))
      SyncEngine.sync(SyncEngine.sourceFor(spark, "delta", s"$dir/a"),
        SyncEngine.targetFor(spark, "hudi", s"$dir/b"))
    }
    syncAll()
    t.evolvePartitionSpec(Seq("status"))
    t.overwrite(t.toDF().localCheckpoint()) // rewrite onto the new spec
    syncAll()
    val d = DeltaTable.forPath(spark, s"$dir/a")
    assert(d.schemaAt(None)._2 == Seq("status"))
    val h = HudiTable.forPath(spark, s"$dir/b")
    assert(h.properties.get("hoodie.table.partition.fields").contains("status"))
    assertSame(t.toDF(), d.toDF(), "delta hop")
    assertSame(t.toDF(), h.toDF(), "hudi hop")
  }

  test("rollback across a spec evolution: sync describes the LIVE files' spec, not the default") {
    val dir = tmpDir("regr_specevo_rollback")
    val t = IcebergTable.create(spark, s"$dir/src", pool.filter(col("k") % 2 === 0), Seq("part"))
    val preEvo = t.currentMetadata.currentSnapshotId.get
    def syncAll(): Unit = {
      SyncEngine.sync(SyncEngine.icebergSource(t), SyncEngine.targetFor(spark, "delta", s"$dir/a"))
      SyncEngine.sync(SyncEngine.sourceFor(spark, "delta", s"$dir/a"),
        SyncEngine.targetFor(spark, "hudi", s"$dir/b"))
    }
    syncAll()
    t.evolvePartitionSpec(Seq("status"))
    t.overwrite(t.toDF().localCheckpoint())
    syncAll()
    // roll main back to the pre-evolution snapshot: live files are
    // old-spec again while the DEFAULT spec stays evolved
    t.rollbackTo(preEvo)
    syncAll()
    val d = DeltaTable.forPath(spark, s"$dir/a")
    assert(d.schemaAt(None)._2 == Seq("part"), s"delta partCols=${d.schemaAt(None)._2}")
    assertSame(t.toDF(), d.toDF(), "delta hop after rollback")
    assertSame(t.toDF(), HudiTable.forPath(spark, s"$dir/b").toDF(), "hudi hop after rollback")
  }

  test("hudi target refuses a partition-field change that leaves old-layout files live") {
    val dir = tmpDir("regr_specevo_mixed")
    val t = IcebergTable.create(spark, s"$dir/src", pool.filter(col("k") % 3 === 0), Seq("part"))
    SyncEngine.sync(SyncEngine.icebergSource(t), SyncEngine.targetFor(spark, "hudi", s"$dir/b"))
    // fabricate the hostile shape: a sync commit that changes partition
    // fields while removing nothing (no source rewrite happened)
    val files = t.snapshotDataFiles().map(f =>
      f.copy(partitionValues = Map("status" -> "O")))
    val e = intercept[IllegalArgumentException] {
      HudiTable.forPath(spark, s"$dir/b").syncCommit(
        t.sparkSchema, Seq("status"), t.dataRoot, files, Seq.empty, Map.empty)
    }
    assert(e.getMessage.contains("partition-field change"))
  }
}
