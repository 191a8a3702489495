package graft.hudi

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Foreign-writer MOR DELETE log blocks: the v3 (avro) layout decodes
 * natively (HoodieDeleteRecordList, HUDI-5760 / release 0.14), merged
 * reads apply the tombstones, and the kryo-era layouts still refuse
 * loudly naming the offending log file.
 */
class HudiDeleteBlockSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  test("delete-block payload codec round-trips; kryo versions refuse with the reason") {
    val keys = Seq(("42", "p1"), ("99", ""), ("7", "a b"))
    val bytes = HudiLogFormat.encodeDeleteBlock(keys)
    assert(HudiLogFormat.decodeDeleteBlock(bytes, "here") == keys)
    // version 2 = kryo era
    val kryo = java.nio.ByteBuffer.allocate(12).putInt(2).putInt(4).putInt(123).array()
    val e = intercept[IllegalStateException](HudiLogFormat.decodeDeleteBlock(kryo, "log-x"))
    assert(e.getMessage.contains("kryo") && e.getMessage.contains("log-x"))
    // malformed avro payload refuses rather than half-applying
    val junk = java.nio.ByteBuffer.allocate(12).putInt(3).putInt(4).putInt(-1).array()
    intercept[IllegalStateException](HudiLogFormat.decodeDeleteBlock(junk, "log-y"))
  }

  test("merged read applies a foreign delete block; change feed reports the deletes") {
    val dir = tmpDir("mor_delblock")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(2), "o_orderkey")
    val all = t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val slice = t.fileSlices(None).head
    // keys owned by this slice, tombstoned by a foreign writer's block
    val victim = spark.read.parquet(
        if (slice.basePath.startsWith("/")) slice.basePath else s"$dir/t/${slice.basePath}")
      .select("o_orderkey").limit(7).collect().map(_.getLong(0)).toSeq
    val from = t.latestInstant
    val inst = t.timeline.nextInstantTime()
    val logName = HudiLogFormat.logFileName(slice.fileId, slice.baseInstant, 1)
    val rel = if (slice.partitionPath.isEmpty) logName else s"${slice.partitionPath}/$logName"
    val logPath = new Path(s"$dir/t", rel)
    val fs = logPath.getFileSystem(new Configuration())
    val size = HudiLogFormat.write(fs, logPath, Seq(HudiLogFormat.LogBlock(
      HudiLogFormat.DeleteBlock,
      Map(HudiLogFormat.HeaderInstantTime -> inst),
      HudiLogFormat.encodeDeleteBlock(victim.map(k => (k.toString, slice.partitionPath))))))
    assert(t.timeline.commit(HudiInstant(inst, "deltacommit"), HudiCommitMetadata(
      partitionToWriteStats = Map(slice.partitionPath -> Seq(HudiWriteStat(
        fileId = slice.fileId, path = rel,
        prevCommit = slice.baseInstant, numWrites = victim.size.toLong,
        fileSizeInBytes = size))),
      partitionToReplaceFileIds = Map.empty,
      extraMetadata = Map.empty,
      operationType = "DELETE")))
    // snapshot read: tombstoned keys gone, everything else intact
    val back = t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(back == all.filterNot(victim.contains), s"${all.size - back.size} deleted")
    // time travel below the delete still sees them
    assert(t.toDF(asOf = Some(from)).count() == all.size)
    // change feed reports them as deletes keyed correctly
    val dels = t.changeFeed(from, inst).filter(col("_change_type") === "delete")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(dels == victim.sorted)
    // read-optimized view ignores logs, as ever
    assert(t.readOptimizedDF().count() == all.size)
    // compaction folds the tombstones into fresh base files
    t.compactMor()
    assert(t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq == back)
    assert(!t.hasLogFiles())
  }

  test("a kryo-era delete block fails the merged read loudly, naming the log") {
    val dir = tmpDir("mor_delblock_kryo")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.limit(50).coalesce(1), "o_orderkey")
    val slice = t.fileSlices(None).head
    val inst = t.timeline.nextInstantTime()
    val logName = HudiLogFormat.logFileName(slice.fileId, slice.baseInstant, 1)
    val rel = if (slice.partitionPath.isEmpty) logName else s"${slice.partitionPath}/$logName"
    val logPath = new Path(s"$dir/t", rel)
    val fs = logPath.getFileSystem(new Configuration())
    val size = HudiLogFormat.write(fs, logPath, Seq(HudiLogFormat.LogBlock(
      HudiLogFormat.DeleteBlock,
      Map(HudiLogFormat.HeaderInstantTime -> inst),
      java.nio.ByteBuffer.allocate(8).putInt(2).putInt(0).array())))
    assert(t.timeline.commit(HudiInstant(inst, "deltacommit"), HudiCommitMetadata(
      partitionToWriteStats = Map(slice.partitionPath -> Seq(HudiWriteStat(
        fileId = slice.fileId, path = rel,
        prevCommit = slice.baseInstant, numWrites = 0L, fileSizeInBytes = size))),
      partitionToReplaceFileIds = Map.empty,
      extraMetadata = Map.empty,
      operationType = "DELETE")))
    val e = intercept[Exception](t.toDF().count())
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else x.getMessage +: chain(x.getCause)
    assert(chain(e).exists(m => m != null && m.contains("kryo")), chain(e).mkString(" | "))
  }
}
