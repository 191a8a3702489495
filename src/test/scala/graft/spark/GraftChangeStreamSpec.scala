package graft.spark

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable

/** `spark.readStream.format("graft")`: the commit log as a micro-batch
  * change feed — snapshot first, then per-commit adds, per format. */
class GraftChangeStreamSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_totalprice"))

  private def drainInto(table: String, path: String): Unit = {
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName(table)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("delta change stream: snapshot batch, then per-commit adds") {
    val dir = tmpDir("stream_delta")
    val o = orders
    val t = DeltaTable.create(spark, s"$dir/t", o.filter(col("o_orderkey") % 2 === 0))
    drainInto("s_delta_0", s"$dir/t")
    assert(spark.table("s_delta_0").count() ==
      o.filter(col("o_orderkey") % 2 === 0).count())
    // new commits stream as increments on a fresh run
    t.append(o.filter(col("o_orderkey") % 2 === 1), Seq.empty)
    drainInto("s_delta_1", s"$dir/t")
    assert(spark.table("s_delta_1").count() == o.count())
    assert(spark.table("s_delta_1").select(sum(col("o_orderkey"))).head.getLong(0) ==
      o.select(sum(col("o_orderkey"))).head.getLong(0))
  }

  test("iceberg and hudi change streams drain to the full table") {
    val dir = tmpDir("stream_ih")
    val o = orders
    val ti = IcebergTable.create(spark, s"$dir/ice", o.filter(col("o_orderkey") % 2 === 0))
    ti.append(o.filter(col("o_orderkey") % 2 === 1))
    drainInto("s_ice", s"$dir/ice")
    assert(spark.table("s_ice").count() == o.count())

    val th = HudiTable.create(spark, s"$dir/hudi", o.filter(col("o_orderkey") % 2 === 0))
    th.append(o.filter(col("o_orderkey") % 2 === 1))
    drainInto("s_hudi", s"$dir/hudi")
    assert(spark.table("s_hudi").count() == o.count())
  }

  test("a checkpointed stream resumes from its offset, not from scratch") {
    val dir = tmpDir("stream_ckpt")
    val o = orders
    val t = DeltaTable.create(spark, s"$dir/t", o.filter(col("o_orderkey") % 2 === 0))
    val ckpt = s"$dir/ckpt"
    val out = s"$dir/out"
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    assert(spark.read.parquet(out).count() ==
      o.filter(col("o_orderkey") % 2 === 0).count())
    t.append(o.filter(col("o_orderkey") % 2 === 1), Seq.empty)
    // the resumed run appends ONLY the new commit's rows — the sink
    // ends exactly at the full table, nothing re-delivered
    drain()
    assert(spark.read.parquet(out).count() == o.count())
    assert(spark.read.parquet(out).select(sum(col("o_orderkey"))).head.getLong(0) ==
      o.select(sum(col("o_orderkey"))).head.getLong(0))
  }
}
