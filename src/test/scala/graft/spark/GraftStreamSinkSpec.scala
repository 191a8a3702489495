package graft.spark

import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable

/** `df.writeStream.format("graft")`: micro-batches land as exactly-once
  * table commits for all three formats. */
class GraftStreamSinkSpec extends SparkTestBase {

  private def session: ClassicSession = spark.asInstanceOf[ClassicSession]

  import org.apache.spark.sql.Encoder
  private implicit def longEnc: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong

  private def drain(src: MemoryStream[Long], fmt: String, path: String, ckpt: String): Unit = {
    val q = src.toDF().select(col("value").as("id"))
      .writeStream.format("graft")
      .option("format", fmt)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(path)
    q.awaitTermination(120000)
  }

  test("stream sink lands batches as commits in every format") {
    for (fmt <- Seq("delta", "iceberg", "hudi")) {
      val dir = tmpDir(s"sink_$fmt")
      implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext = session.sqlContext
      val src = MemoryStream[Long]
      src.addData(1L, 2L, 3L)
      drain(src, fmt, s"$dir/t", s"$dir/ckpt")
      src.addData(4L, 5L)
      drain(src, fmt, s"$dir/t", s"$dir/ckpt")
      val back = spark.read.format("graft").load(s"$dir/t")
      assert(back.count() == 5, s"$fmt sink row count")
      assert(back.agg(sum(col("id"))).head.getLong(0) == 15L, s"$fmt sink content")
    }
  }

  test("a replayed batch id is skipped, never double-committed") {
    val dir = tmpDir("sink_replay")
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext = session.sqlContext
    val src = MemoryStream[Long]
    src.addData(10L, 20L)
    drain(src, "delta", s"$dir/t", s"$dir/ckpt")
    // simulate the crash-replay window: hand the sink the same batch id
    // again directly
    val sink = new org.apache.spark.sql.graftshim.GraftStreamSink(
      spark, "delta", s"$dir/t", Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    val dup = spark.range(100, 102).select(col("id"))
    sink.addBatch(0L, dup)
    assert(DeltaTable.forPath(spark, s"$dir/t").toDF().count() == 2)
    // a NEW batch id lands
    sink.addBatch(1L, dup)
    assert(DeltaTable.forPath(spark, s"$dir/t").toDF().count() == 4)
    assert(DeltaTable.forPath(spark, s"$dir/t")
      .lastCommitProp("graft.stream.batchId").contains("1"))
  }

  test("iceberg and hudi record the batch id in commit metadata") {
    val dir = tmpDir("sink_props")
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext = session.sqlContext
    val si = MemoryStream[Long]
    si.addData(1L)
    drain(si, "iceberg", s"$dir/ice", s"$dir/ckpt_i")
    assert(IcebergTable.forPath(spark, s"$dir/ice")
      .tableProperty("graft.stream.batchId").contains("0"))
    val sh = MemoryStream[Long]
    sh.addData(1L)
    drain(sh, "hudi", s"$dir/hudi", s"$dir/ckpt_h")
    assert(HudiTable.forPath(spark, s"$dir/hudi")
      .lastCommitProp("graft.stream.batchId").contains("0"))
  }
}
