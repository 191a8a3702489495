package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * The 100×-scale planning guard: scans plan from table-format metadata
 * (the [[ManifestFileIndex]]), never by listing or stat-ing the
 * filesystem. The proof is constructive — every file path below is
 * NONEXISTENT, so any `listStatus`/`getFileStatus` during planning
 * would throw; planning succeeding at all means zero FS calls.
 */
class ManifestFileIndexSpec extends SparkTestBase {

  private val nFiles = 10000
  private val nPartitions = 50

  private def syntheticFiles: Seq[ManifestFile] =
    (0 until nFiles).map { i =>
      val p = i % nPartitions
      ManifestFile(
        path = s"/nonexistent/graft_plan_guard/p=$p/part-$i.parquet",
        size = 1000L + i,
        modificationTime = 0L,
        partitionValues = Map("p" -> p.toString))
    }

  test("10k-file scan plans from metadata only: no FS access, pruned, bounded time") {
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("p", IntegerType)))
    val t0 = System.nanoTime()
    val df = ManifestFileIndex.read(
      spark, "/nonexistent/graft_plan_guard", syntheticFiles, schema, Seq("p"))
    val pruned = df.filter(col("p") === 7).select(col("x"))
    // force FULL planning, including the scan's file selection — this
    // is where an InMemoryFileIndex would stampede the metadata store
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val selected = scan.selectedPartitions.toPartitionArray
    val planMs = (System.nanoTime() - t0) / 1e6
    // partition pruning happened at PLAN time: exactly one partition's
    // files survive, out of 10k
    assert(selected.length == nFiles / nPartitions,
      s"expected ${nFiles / nPartitions} files after pruning, got ${selected.length}")
    assert(selected.forall(f =>
      f.urlEncodedPath.contains("/p%3D7/") || f.urlEncodedPath.contains("/p=7/")))
    // sizes came from the manifest, not stat calls
    assert(selected.map(_.fileSize).sum == syntheticFiles
      .filter(_.partitionValues("p") == "7").map(_.size).sum)
    // and column pruning reached the reader: only `x` is read
    assert(scan.requiredSchema.fieldNames.toSeq == Seq("x"))
    assert(planMs < 30000, s"10k-file planning took ${planMs}ms")
  }

  test("unpartitioned 10k-file scan also plans without FS access") {
    val schema = StructType(Seq(StructField("x", LongType)))
    val files = (0 until nFiles).map(i => ManifestFile(
      s"/nonexistent/graft_plan_guard_flat/part-$i.parquet", 10L, 0L, Map.empty))
    val df = ManifestFileIndex.read(
      spark, "/nonexistent/graft_plan_guard_flat", files, schema, Seq.empty)
    val scan = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.selectedPartitions.totalNumberOfFiles == nFiles.toLong)
  }
}
