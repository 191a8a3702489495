package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable
import graft.sync.{GraftCatalog, SyncEngine}

/** Proof of the catalog plug-in seam: a flat layout that ignores
  * namespaces and prefixes every table under a configured root. Loaded
  * by class name via the YAML `impl:` key (reflection, like the
  * reference's `catalogImpl`). */
class FlatTestCatalog(props: Map[String, String]) extends GraftCatalog {
  require(props.contains("root"), "FlatTestCatalog needs `root`")
  val name: String = props.getOrElse("name", "flat")
  def locate(namespace: Option[String], tableName: String, format: String): String =
    s"${props("root").stripSuffix("/")}/flat_${tableName}_$format"
}

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

  test("yaml config parses catalog, clients, and per-dataset table identity") {
    val c = RunSync.parseConfig(
      """sourceFormat: hudi
        |targetFormats:
        |  - iceberg
        |catalog:
        |  name: graft
        |  warehouse: /data/warehouse
        |clients:
        |  iceberg:
        |    commit.retry.num-retries: "4"
        |    history.expire.max-snapshot-age-ms: 86400000
        |  hudi:
        |    hoodie.keep.max.commits: 40
        |datasets:
        |  - tableBasePath: /data/tables/events
        |    tableName: events
        |    namespace: analytics.prod
        |    partitionSpec: ts:MONTH
        |""".stripMargin)
    assert(c.catalog.contains(RunSync.Catalog("graft", "/data/warehouse")))
    assert(c.clients("iceberg") == Map(
      "commit.retry.num-retries" -> "4",
      "history.expire.max-snapshot-age-ms" -> "86400000"))
    assert(c.clients("hudi") == Map("hoodie.keep.max.commits" -> "40"))
    val ds = c.datasets.head
    assert(ds.sourcePath == "/data/tables/events")
    assert(ds.tableName.contains("events") && ds.namespace.contains("analytics.prod"))
    assert(ds.partitionSpec.contains("ts:MONTH"))
    // named table resolves under the catalog warehouse
    assert(RunSync.targetPathFor(c, ds, "iceberg") ==
      "/data/warehouse/analytics/prod/events_iceberg")
  }

  test("named tables land in the catalog warehouse with identity + client props") {
    val dir = tmpDir("runsync_catalog")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val src = DeltaTable.create(spark, s"$dir/src", o)
    val config = RunSync.Config(
      "delta", Seq("iceberg", "hudi"),
      Seq(RunSync.Dataset(s"$dir/src", tableName = Some("orders"),
        namespace = Some("sales.na"))),
      catalog = Some(RunSync.Catalog("graft", s"$dir/wh")),
      clients = Map("iceberg" -> Map("commit.retry.num-retries" -> "4")))
    assert(RunSync.run(spark, config, SyncEngine.Auto) == 0)
    val ice = IcebergTable.forPath(spark, s"$dir/wh/sales/na/orders_iceberg")
    assert(checksum(ice.toDF()) == checksum(src.toDF()))
    // catalog identity and client configuration persisted as properties
    val props = ice.currentMetadata.properties
    assert(props.get("graft.catalog.name").contains("graft"))
    assert(props.get("graft.catalog.table").contains("sales.na.orders"))
    assert(props.get("commit.retry.num-retries").contains("4"))
    val hud = HudiTable.forPath(spark, s"$dir/wh/sales/na/orders_hudi")
    assert(checksum(hud.toDF()) == checksum(src.toDF()))
    assert(hud.latestCommitExtraMetadata.get("graft.catalog.table").contains("sales.na.orders"))
  }

  test("a custom catalog impl loads by class name and drives table placement") {
    val dir = tmpDir("runsync_impl")
    val yaml =
      s"""sourceFormat: delta
         |targetFormats:
         |  - iceberg
         |catalog:
         |  impl: graft.FlatTestCatalog
         |  root: $dir/cat
         |  name: corp
         |datasets:
         |  - sourcePath: $dir/src
         |    tableName: orders
         |    namespace: sales.na
         |""".stripMargin
    val c = RunSync.parseConfig(yaml)
    assert(c.catalog.get.impl.contains("graft.FlatTestCatalog"))
    // extra keys reach the impl's constructor; namespace is ignored by
    // this layout, proving resolution went through the plug-in
    assert(RunSync.targetPathFor(c, c.datasets.head, "iceberg") ==
      s"$dir/cat/flat_orders_iceberg")
    val o = spark.read.parquet(s"$sf0001/region.parquet")
    DeltaTable.create(spark, s"$dir/src", o)
    assert(RunSync.run(spark, c, SyncEngine.Auto) == 0)
    val ice = IcebergTable.forPath(spark, s"$dir/cat/flat_orders_iceberg")
    assert(checksum(ice.toDF()) == checksum(o))
    assert(ice.currentMetadata.properties.get("graft.catalog.name").contains("corp"))
  }

  test("both ends catalog-resolved: create under the impl's layout, sync by name only") {
    val dir = tmpDir("runsync_both_ends")
    val yaml =
      s"""sourceFormat: delta
         |targetFormats:
         |  - iceberg
         |catalog:
         |  impl: graft.FlatTestCatalog
         |  root: $dir/cat
         |  name: corp
         |clients:
         |  iceberg:
         |    commit.retry.num-retries: "7"
         |datasets:
         |  - tableName: orders
         |    namespace: sales.na
         |""".stripMargin
    val c = RunSync.parseConfig(yaml)
    // the SOURCE path itself resolves through the plug-in — no path in
    // the config at all; create the source exactly where the catalog
    // says it lives
    val srcPath = RunSync.sourcePathFor(c, c.datasets.head)
    assert(srcPath == s"$dir/cat/flat_orders_delta")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val src = DeltaTable.create(spark, srcPath, o.filter(col("o_orderkey") % 2 === 0))
    assert(RunSync.run(spark, c, SyncEngine.Auto) == 0)
    val ice = IcebergTable.forPath(spark, s"$dir/cat/flat_orders_iceberg")
    assert(checksum(ice.toDF()) == checksum(src.toDF()))
    // catalog identity + client props carried onto the target
    val props = ice.currentMetadata.properties
    assert(props.get("graft.catalog.name").contains("corp"))
    assert(props.get("graft.catalog.table").contains("sales.na.orders"))
    assert(props.get("commit.retry.num-retries").contains("7"))
    // append at the catalog-resolved source; the re-run is incremental
    src.append(o.filter(col("o_orderkey") % 2 === 1), Seq.empty)
    assert(RunSync.run(spark, c, SyncEngine.Auto) == 0)
    assert(checksum(IcebergTable.forPath(spark, s"$dir/cat/flat_orders_iceberg").toDF()) ==
      checksum(src.toDF()))
    assert(IcebergTable.forPath(spark, s"$dir/cat/flat_orders_iceberg").snapshotIds.size == 2)
  }

  test("an unknown or malformed catalog impl fails fast with the class named") {
    val base = RunSync.Config("delta", Seq("iceberg"),
      Seq(RunSync.Dataset("/s", tableName = Some("t"))))
    val missing = base.copy(catalog =
      Some(RunSync.Catalog("", "", Some("graft.NoSuchCatalog"))))
    val e1 = intercept[IllegalArgumentException](
      RunSync.targetPathFor(missing, missing.datasets.head, "iceberg"))
    assert(e1.getMessage.contains("graft.NoSuchCatalog"))
    // a real class that is not a GraftCatalog is rejected, not cast
    val wrong = base.copy(catalog =
      Some(RunSync.Catalog("", "", Some("java.lang.String"))))
    val e2 = intercept[IllegalArgumentException](
      RunSync.targetPathFor(wrong, wrong.datasets.head, "iceberg"))
    assert(e2.getMessage.contains("does not implement"))
  }

  test("a partitionSpec override drives the target's partition layout") {
    val dir = tmpDir("runsync_spec")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    // a plain (unpartitioned) delta source, but the dataset config says
    // to lay the target out by month(o_orderdate)
    DeltaTable.create(spark, s"$dir/src", o)
    val config = RunSync.Config(
      "delta", Seq("iceberg"),
      Seq(RunSync.Dataset(s"$dir/src", Some(s"$dir/out"),
        partitionSpec = Some("o_orderdate:MONTH"))))
    assert(RunSync.run(spark, config, SyncEngine.Auto) == 0)
    val ice = IcebergTable.forPath(spark, s"$dir/out_iceberg")
    assert(ice.currentMetadata.partitionSpec.nonEmpty)
    assert(ice.currentMetadata.partitionSpec.head.transform == "month")
    assert(checksum(ice.toDF().select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")))
      == checksum(o))
  }

  test("continuous mode picks up source commits that land between cycles") {
    val dir = tmpDir("runsync_cont")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    val src = DeltaTable.create(spark, s"$dir/src", o.filter(col("o_orderkey") % 2 === 0))
    val config = RunSync.Config(
      "delta", Seq("iceberg"),
      Seq(RunSync.Dataset(s"$dir/src", Some(s"$dir/out"))))
    val failures = RunSync.runContinuous(
      spark, config, SyncEngine.Auto, intervalMs = 1L, maxCycles = 3,
      onCycle = c => if (c == 0) src.append(o.filter(col("o_orderkey") % 2 === 1), Seq.empty))
    assert(failures == 0)
    val ice = IcebergTable.forPath(spark, s"$dir/out_iceberg")
    // cycle 0 synced the even half, a later cycle replayed the odd half
    assert(ice.snapshotIds.size == 2)
    assert(checksum(ice.toDF()) == checksum(src.toDF()))
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
