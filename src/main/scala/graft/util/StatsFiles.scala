package graft.util

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

/**
 * Shared ownership/adoption rules for statistics sidecar files (Puffin
 * sketches, partition-statistics rollups) across the format codecs.
 *
 * The ownership model: a table may only ever DELETE a statistics file
 * under its own root, and a sync target ADOPTS a carried file by
 * copying it under its own root — so no operation on one table can
 * dangle another table's registered statistics. Stats files are
 * KB-sized; owning a copy is cheaper (and safer at 100 TB, where
 * source and target often live in different buckets with different
 * lifecycles) than cross-table reference tracking.
 */
object StatsFiles {

  /** Fully-qualified URI string of `p` (scheme + authority filled in by
    * its filesystem) — path-only comparison would let a same-prefix
    * path on a DIFFERENT filesystem pass an ownership check. */
  def qualifiedUri(conf: Configuration, p: Path): String =
    p.getFileSystem(conf).makeQualified(p).toUri.toString

  private def rootPrefix(conf: Configuration, tableRoot: String): String =
    qualifiedUri(conf, new Path(tableRoot)).stripSuffix("/") + "/"

  /** Delete a statistics file ONLY when safe: no surviving entry shares
    * the path (one file can anchor at many snapshots/versions) and the
    * file lives under `tableRoot` on its filesystem. */
  def deleteIfOwned(
      conf: Configuration,
      tableRoot: String,
      path: String,
      survivingPaths: Set[String]): Unit = {
    val p = new Path(path)
    if (!survivingPaths.contains(path) &&
        qualifiedUri(conf, p).startsWith(rootPrefix(conf, tableRoot)))
      p.getFileSystem(conf).delete(p, false)
  }

  /** True for an ADOPTED (sync-carried) statistics file — the
    * deterministic `carried-` adoption prefix is the marker. A carried
    * sketch describes the SOURCE's analyzed row set, not the snapshot
    * the adoption commit anchored it at, so planners must read it as
    * STALE (and floor it with the format's exact current counts) even
    * when its registration anchors at the current snapshot/instant —
    * otherwise a sync that carries an old sketch alongside new rows
    * launders staleness into a fresh-looking under-estimate. */
  def isCarried(path: String): Boolean =
    new Path(path).getName.startsWith("carried-")

  /** One HLL sketch blob tuple for a Puffin write, shared by all three
    * format writers: the 256-register byte array + the cross-engine
    * `ndv` property + the `graft.column` name key that consumers
    * without stable field ids resolve by. */
  def hllBlob(column: String, fieldId: Int, regs: Seq[(Int, Int)])
      : (String, Seq[Int], Map[String, String], Array[Byte]) = {
    val bytes = new Array[Byte](graft.functions.PortableHll.M)
    regs.foreach { case (b, mr) => bytes(b) = mr.toByte }
    (graft.iceberg.Puffin.HllBlobType, Seq(fieldId),
      Map(
        "ndv" -> String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(graft.functions.PortableHll.estimateLocal(regs))),
        "graft.column" -> column),
      bytes)
  }

  /** Read `column`'s register set + ndv back from a Puffin statistics
    * file, resolving the blob by its `graft.column` name property (the
    * Delta/Hudi resolution path; Iceberg resolves by field id). */
  def readRegisters(conf: Configuration, path: String, column: String)
      : (Seq[(Int, Int)], Double) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val blob = graft.iceberg.Puffin.readFooter(fs, p)
      .find(b => b.blobType == graft.iceberg.Puffin.HllBlobType &&
        b.properties.get("graft.column").contains(column))
      .getOrElse(throw new IllegalStateException(
        s"no ${graft.iceberg.Puffin.HllBlobType} blob for $column at $path"))
    val bytes = graft.iceberg.Puffin.blobPayload(fs, p, blob)
    (bytes.zipWithIndex.collect { case (b, i) if b != 0 => (i, b.toInt) }.toSeq,
      blob.properties("ndv").toDouble)
  }

  /** Adopt a sync-carried statistics file by COPYING it to
    * `tableRoot/statsDir/carried-<name>`. The copy name is
    * deterministic in the source file's name, so repeated syncs
    * carrying the same analyzed file re-use one copy and chained hops
    * don't stack prefixes; the stage+rename means a concurrent adopter
    * either wins the rename or finds the winner's identical copy.
    * A path already under `tableRoot` is returned as-is; a missing
    * source file yields None (stale provenance — nothing to promote).
    * The `created` flag is true iff THIS call placed the copy: a sync
    * that adopts and then loses its commit CAS must delete exactly the
    * copies it created (a pre-existing copy may be the LIVE registered
    * file of an earlier successful sync) or the stats dir grows one
    * orphan per lost race. */
  def adoptIntoTracked(
      conf: Configuration,
      tableRoot: String,
      statsDir: String,
      src: Path): Option[(Path, Boolean)] = {
    val srcFs = src.getFileSystem(conf)
    if (!srcFs.exists(src)) None
    // as-is ONLY for a path already inside OUR stats dir (a re-sync
    // whose prop points at our own previously adopted copy). Merely
    // being under the table root is not enough: a source table nested
    // inside the target's root would hand over its native file
    // verbatim, and the un-prefixed name would dodge the isCarried
    // staleness fence every planner freshness check relies on.
    else if (qualifiedUri(conf, src).startsWith(
        rootPrefix(conf, new Path(tableRoot, statsDir).toString)))
      Some((src, false))
    else {
      val dst = new Path(tableRoot,
        s"$statsDir/carried-${src.getName.stripPrefix("carried-")}")
      val dstFs = dst.getFileSystem(conf)
      if (dstFs.exists(dst)) Some((dst, false))
      else {
        val tmp = new Path(tableRoot, s"$statsDir/.adopt-${UUID.randomUUID()}")
        FileUtil.copy(srcFs, src, dstFs, tmp, false, conf)
        // a concurrent adopter racing to the same deterministic name is
        // fine either way: the winner's copy is byte-identical
        val won = dstFs.rename(tmp, dst)
        if (!won && !dstFs.exists(dst))
          throw new IllegalStateException(s"could not place carried stats copy $dst")
        if (dstFs.exists(tmp)) dstFs.delete(tmp, false)
        Some((dst, won))
      }
    }
  }
}
