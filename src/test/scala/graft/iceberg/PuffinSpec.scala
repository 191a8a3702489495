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
    // a 13-value column fills exactly 13 buckets; the LINEAR-COUNTING
    // branch (zero registers exist, raw est ≤ 2.5·m) puts the ndv
    // within ~3% instead of the raw estimator's ~190, and the property
    // must equal the SQL-path register replay exactly (driver and SQL
    // estimators share one arithmetic)
    val (regsS, ndvS) = t.statisticsRegisters("s")
    assert(regsS.size == 13, s"${regsS.size}")
    assert(math.abs(ndvS - 13.0) / 13.0 < 0.05, s"$ndvS")
    val replayS = graft.functions.PortableHll.estimate(
      spark.createDataFrame(regsS).toDF("bucket", "mr")).collect()(0).getDouble(0)
    assert(ndvS == replayS, s"($ndvS, $replayS)")
    // the 1000-distinct column lands within plain-HLL accuracy (~7%
    // at m=256; 15% bound keeps the test hash-stable)
    val (_, ndvK) = t.statisticsRegisters("k")
    assert(math.abs(ndvK - 1000.0) / 1000.0 < 0.15, s"$ndvK")
    // re-analyzing the same snapshot REPLACES its entry (no duplicates)
    // and deletes the superseded file — nothing references it anymore
    t.writeStatistics(Seq("k"))
    assert(IcebergTable.forPath(spark, s"$dir/t").currentMetadata.statistics.size == 1)
    assert(!fs(new Path(e1.path)).exists(new Path(e1.path)),
      "superseded stats file must be deleted on re-analyze")
    // a later append keeps the entry reachable via the ancestor walk
    t.append(src.limit(0))
    val t2 = IcebergTable.forPath(spark, s"$dir/t")
    assert(t2.statisticsFor().nonEmpty)
    assert(t2.statisticsFor().get.snapshotId != t2.currentMetadata.currentSnapshotId.get)
  }

  test("ANALYZE of many columns runs exactly ONE Spark job (one table scan)") {
    val dir = tmpDir("puffin_onepass")
    val src = spark.range(0, 2000).select(
      col("id").as("a"), (col("id") % 7).as("b"),
      (col("id") % 13).cast("string").as("c"), (col("id") % 97).as("d"))
    val t = IcebergTable.create(spark, s"$dir/t", src)
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          read.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      t.writeStatistics(Seq("a", "b", "c", "d"))
      // listener delivery is async: wait until the count stops moving
      var last = -1L
      var spins = 0
      while (read.get() != last && spins < 50) {
        last = read.get(); Thread.sleep(100); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // the stacked register aggregation is the ONLY action that touches
    // rows: 4 columns, ONE scan of the 2000-row table (the old shape
    // was 2 jobs PER column = 16000 records), one shuffle of ≤ 4×256
    // register rows, ndv computed driver-side from the collected
    // registers. Manifest/metadata reads contribute a handful of
    // records at most — well under the second-scan threshold.
    assert(read.get() < 2 * 2000,
      s"ANALYZE read ${read.get()} records — more than one table scan")
    assert(read.get() >= 2000, s"ANALYZE read ${read.get()} records — scan not observed")
    // and the registers must equal the per-column single-pass build
    Seq("a", "b", "c", "d").foreach { c =>
      val (regs, ndv) = t.statisticsRegisters(c)
      val one = graft.functions.PortableHll
        .registers(t.toDF(), col(c)).collect()
        .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
      assert(regs.sortBy(_._1) == one, s"register mismatch for $c")
      assert(ndv == graft.functions.PortableHll.estimateLocal(one))
    }
  }

  test("ANALYZE of an all-NULL column records ndv 0.00 with empty registers") {
    val dir = tmpDir("puffin_null")
    val src = spark.range(0, 50).select(
      col("id").as("k"), lit(null).cast("string").as("s"))
    val t = IcebergTable.create(spark, s"$dir/t", src)
    t.writeStatistics(Seq("s", "k"))
    val (regs, ndv) = t.statisticsRegisters("s")
    assert(regs.isEmpty && ndv == 0.0, s"($regs, $ndv)")
    val (_, ndvK) = t.statisticsRegisters("k")
    assert(ndvK > 0.0)
  }

  test("registering stats for a snapshot expired mid-ANALYZE raises the typed race and cleans up") {
    val dir = tmpDir("puffin_race")
    val src = spark.range(0, 100).select(col("id").as("k"))
    val t = IcebergTable.create(spark, s"$dir/t", src)
    val doomed = t.currentMetadata.currentSnapshotId.get
    // the world moves between ANALYZE's scan and its registration CAS:
    // an append supersedes the analyzed snapshot and expiry kills it
    t.append(src)
    assert(t.expireSnapshots(System.currentTimeMillis() + 1000) == 1)
    val path = new Path(s"$dir/t/metadata/race.stats")
    val entry = Puffin.write(fs(path), path, doomed, 1L,
      Seq((Puffin.HllBlobType, Seq(1), Map("ndv" -> "1.00"),
        new Array[Byte](graft.functions.PortableHll.M))))
    val ex = intercept[graft.model.ConcurrentSyncException] {
      t.registerStatistics(doomed, entry)
    }
    assert(ex.getMessage.contains("expired"))
    // the unregistrable file must not be left orphaned on disk
    assert(!fs(path).exists(path))
    assert(IcebergTable.forPath(spark, s"$dir/t").currentMetadata.statistics.isEmpty)
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
