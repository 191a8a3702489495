package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.delta.DeltaTable
import graft.iceberg.{IcebergManifests, IcebergTable}

/**
 * Mid-scale harness for the STATISTICS plane (measured, not
 * plan-asserted — the ScaleIngestSpec pattern): on a multi-million-row,
 * many-file table, the one-pass ANALYZE costs ONE table scan, the
 * partition rollup costs one distributed manifest replay, and the
 * planner-side consumption — plannedSize / the filtered-scan estimate —
 * stays KB-sized metadata work: orders of magnitude under the ANALYZE,
 * and ZERO manifest opens for the rollup-backed estimates. At 100 TB
 * the decision path is what runs per QUERY; this pins that it never
 * degenerates into per-file (or per-row) work as the table grows.
 * Excluded from the default run: set GRAFT_SCALE_TESTS=1 to run.
 */
class StatsScaleSpec extends SparkTestBase {

  private def gated(): Unit =
    assume(sys.env.contains("GRAFT_SCALE_TESTS"),
      "scale harness — set GRAFT_SCALE_TESTS=1 to run")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test("statistics plane at scale: one-pass ANALYZE; planning stays metadata-sized") {
    gated()
    val dir = tmpDir("scale_stats")
    val rows = 2000000L
    val data = spark.range(rows).select(
      col("id").as("k"),
      pmod(col("id"), lit(16)).cast("string").as("p"),
      (col("id") % 9973).as("v"))
      .repartition(32)
    val (t, createSec) = timed(IcebergTable.create(spark, s"$dir/dim", data, Seq("p")))
    val (_, analyzeSec) = timed(t.writeStatistics(Seq("k", "v")))
    val (_, rollupSec) = timed(t.writePartitionStatistics())
    val fileCount = t.currentMetadata.currentSnapshot
      .map(_.summary.getOrElse("added-data-files", "?")).getOrElse("?")
    // the broadcast decision: registered ndv + rollup + manifest-list
    // freshness — metadata and one KB parquet read, never a data scan
    val (size, decideSec) = timed(StatsJoin.plannedSize(t, "k").get)
    assert(size.fresh, "analyze-at-current must read fresh")
    assert(math.abs(size.rows - rows) / rows < 0.25, s"${size.rows}")
    // the filtered-dim estimate consumes the rollup ALONE — pinned to
    // zero manifest opens even at this file count
    val before = IcebergManifests.manifestReads.get()
    val (est, estSec) = timed(
      t.scan.partitionIn("p", Set("3")).estimatedRows().get)
    assert(IcebergManifests.manifestReads.get() == before,
      "rollup-backed estimates must not open manifests")
    assert(est == rows / 16, s"$est")
    info(f"stats scale (iceberg): rows=$rows files=$fileCount " +
      f"create ${createSec}%.1f s, analyze ${analyzeSec}%.1f s, " +
      f"rollup ${rollupSec}%.1f s, decision ${decideSec}%.2f s, " +
      f"filtered estimate ${estSec}%.2f s")
    // the per-query decision must be orders under the per-table ANALYZE
    assert(decideSec < analyzeSec / 2,
      f"planning decision (${decideSec}%.2f s) rivals the ANALYZE " +
        f"(${analyzeSec}%.1f s) — the planning path is doing data-scale work")
    assert(estSec < 5.0,
      f"filtered estimate took ${estSec}%.2f s — not a KB-sized read")

    // Delta: same ANALYZE shape; the planning facts are ONE aggregate
    // over the log replay (never a per-file stats parse on the driver)
    val dd = DeltaTable.create(spark, s"$dir/ddim", data, Seq.empty)
    val (_, dAnalyzeSec) = timed(dd.writeStatistics(Seq("k")))
    val (ds, dDecideSec) = timed(StatsJoin.plannedSize(dd, "k").get)
    assert(ds.fresh && math.abs(ds.rows - rows) / rows < 0.25, s"$ds")
    info(f"stats scale (delta): analyze ${dAnalyzeSec}%.1f s, " +
      f"decision ${dDecideSec}%.2f s")
    assert(dDecideSec < dAnalyzeSec / 2,
      f"delta planning decision (${dDecideSec}%.2f s) rivals its ANALYZE " +
        f"(${dAnalyzeSec}%.1f s)")
  }
}
