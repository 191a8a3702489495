package graft.iceberg

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Puffin statistics files: container round-trip, metadata
  * registration, ancestor lookup, and expiry cleanup. */
class PuffinSpec extends SparkTestBase {

  private def fs(p: Path) = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("puffin container round-trips blobs, magics and footer sizes") {
    val dir = tmpDir("puffin_rt")
    val path = new Path(s"$dir/s.stats")
    val payloadA = Array.tabulate[Byte](256)(i => (i % 57).toByte)
    val payloadB = "opaque-foreign-sketch".getBytes("UTF-8")
    val entry = Puffin.write(fs(path), path, snapshotId = 42L, sequenceNumber = 7L, Seq(
      (Puffin.HllBlobType, Seq(3), Map("ndv" -> "123.45"), payloadA),
      ("apache-datasketches-theta-v1", Seq(4, 5), Map.empty, payloadB)))
    assert(entry.fileSizeBytes == fs(path).getFileStatus(path).getLen)
    val blobs = Puffin.readFooter(fs(path), path)
    assert(blobs.size == 2)
    val a = blobs.find(_.blobType == Puffin.HllBlobType).get
    assert(a.fields == Seq(3) && a.snapshotId == 42L && a.sequenceNumber == 7L &&
      a.properties("ndv") == "123.45")
    assert(Puffin.blobPayload(fs(path), path, a).sameElements(payloadA))
    // a FOREIGN blob type reads back as opaque bytes with metadata intact
    val b = blobs.find(_.blobType == "apache-datasketches-theta-v1").get
    assert(b.fields == Seq(4, 5))
    assert(Puffin.blobPayload(fs(path), path, b).sameElements(payloadB))
    // blobs start right after the head magic, back to back
    assert(a.offset == 4 && b.offset == 4 + payloadA.length)
  }

  test("writeStatistics registers per-column sketches; re-analyze replaces; append keeps") {
    val dir = tmpDir("puffin_tbl")
    val src = spark.range(0, 1000).select(
      col("id").as("k"), (col("id") % 13).cast("string").as("s"))
    val t = IcebergTable.create(spark, s"$dir/t", src)
    val e1 = t.writeStatistics(Seq("k", "s"))
    assert(e1.blobs.size == 2 && e1.blobs.forall(_.blobType == Puffin.HllBlobType))
    // a 13-value column fills exactly 13 buckets; its ndv property is
    // the plain-HLL estimate (no low-range correction — the q35
    // estimator, which targets the large-ndv planning regime) and must
    // equal the register replay exactly
    val (regsS, ndvS) = t.statisticsRegisters("s")
    assert(regsS.size == 13, s"${regsS.size}")
    val replayS = graft.functions.PortableHll.estimate(
      spark.createDataFrame(regsS).toDF("bucket", "mr")).collect()(0).getDouble(0)
    assert(ndvS == replayS, s"($ndvS, $replayS)")
    // the 1000-distinct column lands within plain-HLL accuracy (~7%
    // at m=256; 15% bound keeps the test hash-stable)
    val (_, ndvK) = t.statisticsRegisters("k")
    assert(math.abs(ndvK - 1000.0) / 1000.0 < 0.15, s"$ndvK")
    // re-analyzing the same snapshot REPLACES its entry (no duplicates)
    t.writeStatistics(Seq("k"))
    assert(IcebergTable.forPath(spark, s"$dir/t").currentMetadata.statistics.size == 1)
    // a later append keeps the entry reachable via the ancestor walk
    t.append(src.limit(0))
    val t2 = IcebergTable.forPath(spark, s"$dir/t")
    assert(t2.statisticsFor().nonEmpty)
    assert(t2.statisticsFor().get.snapshotId != t2.currentMetadata.currentSnapshotId.get)
  }

  test("expiry drops statistics of expired snapshots and deletes their files") {
    val dir = tmpDir("puffin_exp")
    val src = spark.range(0, 100).select(col("id").as("k"))
    val t = IcebergTable.create(spark, s"$dir/t", src)
    val e1 = t.writeStatistics(Seq("k"))
    t.append(src)
    t.writeStatistics(Seq("k")) // analyzed at the NEW head too
    assert(t.currentMetadata.statistics.size == 2)
    assert(t.expireSnapshots(System.currentTimeMillis() + 1000) == 1)
    val after = IcebergTable.forPath(spark, s"$dir/t").currentMetadata
    assert(after.statistics.size == 1, s"${after.statistics}")
    assert(after.statistics.head.snapshotId == after.currentSnapshotId.get)
    // the expired snapshot's stats FILE went with it; the live one stays
    assert(!fs(new Path(e1.path)).exists(new Path(e1.path)))
    assert(fs(new Path(after.statistics.head.path)).exists(
      new Path(after.statistics.head.path)))
  }
}
