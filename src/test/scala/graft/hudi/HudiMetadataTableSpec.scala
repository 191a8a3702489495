package graft.hudi

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Real-layout `.hoodie/metadata` files partition: its own MOR timeline
 * of deltacommits at the data commits' instant times, log files in the
 * documented naming convention, HoodieMetadataRecord-shaped listings,
 * and merge semantics (tombstones drop replaced / rolled-back files).
 */
class HudiMetadataTableSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"))

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listing(t: HudiTable): Map[String, Map[String, Long]] =
    HudiMetadataTable.readFiles(
      fs(t.tablePath), spark.sparkContext.hadoopConfiguration, t.tablePath)

  test("layout: metadata table dir, own timeline, log naming, per-commit deltacommits") {
    val dir = tmpDir("hmt_layout")
    val t = HudiTable.create(spark, s"$dir/t", orders.limit(100))
    t.append(orders.limit(50))
    val f = fs(s"$dir/t")
    val props = new Path(s"$dir/t/.hoodie/metadata/.hoodie/hoodie.properties")
    assert(f.exists(props), "metadata table needs its own hoodie.properties")
    val filesDir = new Path(s"$dir/t/.hoodie/metadata/files")
    val logs = f.listStatus(filesDir).map(_.getPath.getName)
      .filter(HudiLogFormat.isLogPath)
    assert(logs.length == 2, s"one files-partition log per data commit: $logs")
    logs.foreach(n => assert(HudiLogFormat.parseLogFileName(n).nonEmpty,
      s"log name $n must follow the Hudi convention"))
    // metadata timeline mirrors the data timeline's instant times
    val metaTimeline = new HudiTimeline(
      s"$dir/t/.hoodie/metadata", spark.sparkContext.hadoopConfiguration)
    assert(metaTimeline.completedInstants().map(_.time) == t.instants)
    assert(metaTimeline.completedInstants().forall(_.action == "deltacommit"))
  }

  test("listing matches the live file set; overwrite tombstones replaced files") {
    val dir = tmpDir("hmt_listing")
    val t = HudiTable.create(spark, s"$dir/t", orders.limit(100).repartition(2))
    t.append(orders.limit(40))
    val live0 = t.fileSlices().map(s => new Path(s.basePath).getName).toSet
    assert(listing(t).values.flatMap(_.keys).toSet == live0)
    t.overwrite(orders.limit(10))
    val live1 = t.fileSlices().map(s => new Path(s.basePath).getName).toSet
    assert(listing(t).values.flatMap(_.keys).toSet == live1,
      "replaced files must be tombstoned out of the listing")
    // sizes come from the write stats, not stat calls
    val sizes = listing(t).values.flatten.toMap
    t.fileSlices().foreach(s =>
      assert(sizes(new Path(s.basePath).getName) == s.baseSize))
  }

  test("partitioned table: listing keyed by partition path") {
    val dir = tmpDir("hmt_part")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val t = HudiTable.create(spark, s"$dir/t", src, Seq("o_orderstatus"))
    val byPart = listing(t)
    assert(byPart.keySet == t.fileSlices().map(_.partitionPath).toSet)
    assert(byPart.keys.forall(_.startsWith("o_orderstatus=")))
  }

  test("rollback tombstones the revoked files; MOR upsert lists its log files") {
    val dir = tmpDir("hmt_roll")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.limit(100), "o_orderkey")
    t.upsert(orders.limit(20).withColumn("o_orderstatus", lit("Z")))
    val withLogs = listing(t).values.flatMap(_.keys).toSet
    assert(withLogs.exists(HudiLogFormat.isLogPath),
      "the files partition must list MOR log files too")
    t.rollback() // revokes the upsert's log files
    val after = listing(t).values.flatMap(_.keys).toSet
    assert(!after.exists(HudiLogFormat.isLogPath), s"rolled-back logs must drop out: $after")
    assert(after == t.fileSlices().map(s => new Path(s.basePath).getName).toSet)
  }
}
