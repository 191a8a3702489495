package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable
import graft.sync.SyncEngine

class RunSyncSpec extends SparkTestBase {

  private def checksum(df: org.apache.spark.sql.DataFrame): Long =
    df.select(sum(hash(df.columns.map(col): _*)).cast("long")).collect()(0).getLong(0)

  test("yaml config parses the reference shape") {
    val c = RunSync.parseConfig(
      """# sync config
        |sourceFormat: delta
        |targetFormats:
        |  - iceberg
        |  - hudi
        |datasets:
        |  - sourcePath: /data/t1
        |    targetPathPrefix: /out/t1
        |  - sourcePath: /data/t2
        |""".stripMargin)
    assert(c.sourceFormat == "delta")
    assert(c.targetFormats == Seq("iceberg", "hudi"))
    assert(c.datasets == Seq(
      RunSync.Dataset("/data/t1", Some("/out/t1")),
      RunSync.Dataset("/data/t2", None)))
  }

  test("run syncs a Delta table into Iceberg and Hudi targets; re-run is incremental") {
    val dir = tmpDir("runsync")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val src = DeltaTable.create(spark, s"$dir/src", o.filter(col("o_orderkey") % 2 === 0))
    val config = RunSync.Config(
      "delta", Seq("iceberg", "hudi"),
      Seq(RunSync.Dataset(s"$dir/src", Some(s"$dir/out"))))
    assert(RunSync.run(spark, config, SyncEngine.Auto) == 0)
    val ice = IcebergTable.forPath(spark, s"$dir/out_iceberg")
    val hud = HudiTable.forPath(spark, s"$dir/out_hudi")
    assert(checksum(ice.toDF()) == checksum(src.toDF()))
    assert(checksum(hud.toDF()) == checksum(src.toDF()))
    // append + re-run: both targets advance incrementally
    src.append(o.filter(col("o_orderkey") % 2 === 1), Seq.empty)
    assert(RunSync.run(spark, config, SyncEngine.Auto) == 0)
    assert(checksum(IcebergTable.forPath(spark, s"$dir/out_iceberg").toDF()) == checksum(src.toDF()))
    assert(IcebergTable.forPath(spark, s"$dir/out_iceberg").snapshotIds.size == 2)
  }

  test("a failing target is isolated and reported, others still sync") {
    val dir = tmpDir("runsync_fail")
    val o = spark.read.parquet(s"$sf0001/region.parquet")
    DeltaTable.create(spark, s"$dir/src", o)
    val config = RunSync.Config(
      "delta", Seq("nosuchformat", "iceberg"),
      Seq(RunSync.Dataset(s"$dir/src", Some(s"$dir/out"))))
    assert(RunSync.run(spark, config, SyncEngine.Auto) == 1)
    assert(checksum(IcebergTable.forPath(spark, s"$dir/out_iceberg").toDF()) ==
      checksum(spark.read.parquet(s"$sf0001/region.parquet")))
  }
}
