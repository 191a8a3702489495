package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Multi-part and V2 checkpoint layouts (Delta PROTOCOL.md): naming,
 * `_last_checkpoint` discovery, sidecar resolution, replay after log
 * expiry, protocol gating, and tolerance for foreign checkpoints whose
 * add struct lacks this writer's optional subfields.
 */
class DeltaCheckpointSpec extends SparkTestBase {

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logFiles(table: String): Seq[String] =
    fs(table).listStatus(new Path(table, "_delta_log")).toSeq.map(_.getPath.getName)

  test("multi-part checkpoint: spec naming, replay, survives log expiry") {
    val dir = tmpDir("delta_mp")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    val t = DeltaTable.create(spark, s"$dir/t", src.limit(20))
    (1 to 11).foreach(_ => t.append(src.limit(5), Seq.empty))
    val before = t.toDF().count()
    t.checkpoint(parts = 3)
    val parts = logFiles(s"$dir/t").filter(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
    assert(parts.size == 3, s"expected 3 spec-named parts, got $parts")
    assert(parts.forall(_.startsWith(f"${11L}%020d")))
    // a fresh handle replays from the parts after pre-checkpoint expiry
    assert(t.log.expireLogBefore(11L) == 11)
    val t2 = DeltaTable.forPath(spark, s"$dir/t")
    assert(t2.toDF().count() == before)
    assert(t2.schemaAt(None)._1.fieldNames.sameElements(Array("o_orderkey", "o_totalprice")))
    // appends keep working on top of the multi-part base
    t2.append(src.limit(5), Seq.empty)
    assert(t2.toDF().count() == before + 5)
  }

  test("v2 checkpoint: protocol upgrade commit, sidecar layout, replay after expiry") {
    val dir = tmpDir("delta_v2cp")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val t = DeltaTable.create(spark, s"$dir/t", src.limit(30))
    (1 to 4).foreach(_ => t.append(src.limit(10), Seq.empty))
    val before = t.toDF().count()
    t.checkpointV2(sidecarParts = 2)
    // the upgrade landed as its own commit BEFORE the checkpoint
    val p = t.log.protocolAt(None)
    assert(p.minReaderVersion == 3)
    assert(p.readerFeatures.exists(_.contains("v2Checkpoint")))
    assert(p.writerFeatures.exists(_.contains("v2Checkpoint")))
    val top = logFiles(s"$dir/t").filter(_.matches("\\d{20}\\.checkpoint\\.[^.]+\\.json"))
    assert(top.size == 1, s"expected one top-level v2 file, got $top")
    val sidecars = fs(s"$dir/t").listStatus(new Path(s"$dir/t/_delta_log/_sidecars"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(sidecars.length == 2, s"expected 2 sidecars, got ${sidecars.toSeq}")
    // expire everything below the checkpoint: snapshot, schema, and
    // protocol all reconstruct from the top-level file + sidecars
    val cpV = t.log.lastCheckpoint().get
    t.log.expireLogBefore(cpV)
    val t2 = DeltaTable.forPath(spark, s"$dir/t")
    assert(t2.toDF().count() == before)
    assert(t2.log.protocolAt(None).readerFeatures.exists(_.contains("v2Checkpoint")))
    // writes continue on top of a v2 base
    t2.append(src.limit(10), Seq.empty)
    assert(t2.toDF().count() == before + 10)
  }

  test("v2 checkpoint carries deletion vectors through the sidecars") {
    val dir = tmpDir("delta_v2dv")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    val t = DeltaTable.create(spark, s"$dir/t", src.limit(50))
    t.delete(col("o_orderkey") % 2 === 0)
    val expect = t.toDF().count()
    t.checkpointV2()
    t.log.expireLogBefore(t.log.lastCheckpoint().get)
    val t2 = DeltaTable.forPath(spark, s"$dir/t")
    assert(t2.toDF().count() == expect, "DV must survive the sidecar round-trip")
    assert(t2.toDF().filter(col("o_orderkey") % 2 === 0).count() == 0)
  }

  test("foreign checkpoint without stats/deletionVector subfields reads fine") {
    val dir = tmpDir("delta_foreign")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    val t = DeltaTable.create(spark, s"$dir/t", src)
    t.append(src.limit(2), Seq.empty)
    val before = t.toDF().count()
    t.checkpoint()
    // strip the optional add subfields a minimal foreign writer omits
    val cp = s"$dir/t/_delta_log/${f"${1L}%020d"}.checkpoint.parquet"
    val slim = spark.read.parquet(cp).select(
      when(col("add.path").isNotNull, struct(
        col("add.path").as("path"),
        col("add.partitionValues").as("partitionValues"),
        col("add.size").as("size"))).as("add"),
      col("metaData"), col("protocol"))
    val staging = s"$dir/slim"
    slim.coalesce(1).write.parquet(staging)
    val part = fs(dir).listStatus(new Path(staging))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs(dir).delete(new Path(cp), false)
    assert(fs(dir).rename(part, new Path(cp)))
    t.log.expireLogBefore(1L)
    val t2 = DeltaTable.forPath(spark, s"$dir/t")
    assert(t2.toDF().count() == before)
  }

  test("_last_checkpoint naming a missing checkpoint fails with the version named") {
    val dir = tmpDir("delta_dangling")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    val t = DeltaTable.create(spark, s"$dir/t", src)
    t.checkpoint()
    // delete the checkpoint file but leave the pointer
    val cp = new Path(s"$dir/t/_delta_log/${f"${0L}%020d"}.checkpoint.parquet")
    assert(fs(dir).delete(cp, false))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, s"$dir/t").log.resolveCheckpoint(None)
    }
    assert(e.getMessage.contains("v0"))
  }
}
