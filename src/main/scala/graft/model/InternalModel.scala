package graft.model

import org.apache.spark.sql.types._

/**
 * Canonical (format-agnostic) table model — the "OneTable model" of the
 * reference, re-expressed as Scala case classes that are bijective with
 * Spark's `StructType` so the rest of the engine can stay in DataFrame
 * land.
 *
 * Reference shapes (see SURVEY.md §1.1):
 *  - table:    reference `api/.../model/OneTable.java:38-53`
 *  - snapshot: reference `api/.../model/OneSnapshot.java:42-53`
 *  - schema:   reference `api/.../model/schema/OneSchema.java:43-85`
 *  - file:     reference `api/.../model/storage/OneDataFile.java:39-55`
 *  - stats:    reference `api/.../model/stat/ColumnStat.java:33-40`
 *
 * Design departure from the reference: data-file manifests are not Java
 * collections on the driver but `Dataset[InternalDataFile]`, so file-set
 * algebra (diffs, grouping, stats rollup) runs distributed and survives
 * 100 TB-scale tables with millions of files.
 */

/** Layout of data files on storage (ref `DataLayoutStrategy.java:29-33`). */
sealed trait LayoutStrategy
object LayoutStrategy {
  case object HiveStylePartition extends LayoutStrategy
  case object DirHierarchyPartitionValues extends LayoutStrategy
  case object Flat extends LayoutStrategy
}

/** Data file format (ref `FileFormat.java:26-30`). */
sealed abstract class DataFileFormat(val name: String)
object DataFileFormat {
  case object Parquet extends DataFileFormat("parquet")
  case object Orc extends DataFileFormat("orc")
  case object Avro extends DataFileFormat("avro")
  def fromName(s: String): DataFileFormat = s.toLowerCase match {
    case "parquet" => Parquet
    case "orc"     => Orc
    case "avro"    => Avro
    case other     => throw new IllegalArgumentException(s"unknown file format: $other")
  }
}

/** Table formats we translate between (ref `TableFormat.java:26-37`). */
sealed abstract class TableFormat(val name: String)
object TableFormat {
  case object Delta extends TableFormat("delta")
  case object Iceberg extends TableFormat("iceberg")
  case object Hudi extends TableFormat("hudi")
  val all: Seq[TableFormat] = Seq(Delta, Iceberg, Hudi)
  def fromName(s: String): TableFormat = s.toLowerCase match {
    case "delta"   => Delta
    case "iceberg" => Iceberg
    case "hudi"    => Hudi
    case other     => throw new IllegalArgumentException(s"unknown table format: $other")
  }
}

// Partition transforms live in PartitionTransform.scala:
// TimeGranularity / PartitionFieldDef / PartitionTransform (spec parse,
// value codecs, Delta generated-column expressions, Iceberg ordinals).

/**
 * Per-column, per-file statistics (ref `ColumnStat.java:33-40` +
 * `Range.java:58-77`). Min/max are canonicalized to strings with a typed
 * tag so a single encoder-friendly shape covers all scalar types; dates
 * are epoch-days, timestamps epoch-micros (ref Range javadoc
 * `api/.../stat/Range.java:31-56`).
 */
final case class ColumnStatRow(
    column: String,
    minValue: Option[String],
    maxValue: Option[String],
    numNulls: Long,
    numValues: Long,
    totalSize: Long)

/**
 * A single data file in a snapshot (ref `OneDataFile.java:39-55`). Rows of
 * the distributed manifest `Dataset[InternalDataFile]`.
 */
final case class InternalDataFile(
    physicalPath: String,
    fileFormat: String = DataFileFormat.Parquet.name,
    /** partition column name -> serialized value (hive-style string). */
    partitionValues: Map[String, String] = Map.empty,
    fileSizeBytes: Long = 0L,
    recordCount: Long = 0L,
    columnStats: Seq[ColumnStatRow] = Seq.empty,
    lastModified: Long = 0L)

/** Point-in-time table definition (ref `OneTable.java:38-53`). */
final case class InternalTable(
    name: String,
    basePath: String,
    schema: StructType,
    partitionFields: Seq[PartitionFieldDef] = Seq.empty,
    layout: LayoutStrategy = LayoutStrategy.HiveStylePartition,
    recordKeyFields: Seq[String] = Seq.empty,
    latestCommitTimeMillis: Long = 0L)

/**
 * A committed, queryable snapshot: version + table def + file manifest
 * (ref `OneSnapshot.java:42-53`). The manifest is left as a DataFrame-able
 * Seq here only at metadata scale; readers hand out Datasets.
 */
final case class SnapshotInfo(
    version: Long,
    timestampMillis: Long,
    table: InternalTable)

/**
 * One commit's worth of change: files added and removed (ref
 * `TableChange.java:31-39` / `OneDataFilesDiff.java:36-70`). The natural
 * unit of incremental sync — a CDF-style micro-batch.
 */
final case class TableChange(
    version: Long,
    timestampMillis: Long,
    filesAdded: Seq[InternalDataFile],
    filesRemoved: Seq[InternalDataFile],
    schemaChanged: Boolean = false)

/** Result of one sync to one target (ref `SyncResult.java:33-67`). */
sealed trait SyncStatus
object SyncStatus {
  case object Success extends SyncStatus
  case object Aborted extends SyncStatus
  final case class Error(message: String, canRetry: Boolean) extends SyncStatus
}
final case class SyncResult(
    target: String,
    mode: String, // "FULL" | "INCREMENTAL"
    status: SyncStatus,
    syncedVersion: Long,
    durationMillis: Long)

/**
 * Sync watermark persisted in the *target* table's commit metadata, so a
 * crash can never desynchronize state from data (ref
 * `OneTableMetadata.java:36-63`).
 */
final case class SyncMetadata(
    lastInstantSynced: Long,
    instantsToConsiderForNextSync: Seq[Long] = Seq.empty) {
  def serialize: String =
    s"$lastInstantSynced;${instantsToConsiderForNextSync.sorted.mkString(",")}"
}
object SyncMetadata {
  val LastSyncedKey = "graft.lastInstantSynced"
  val PendingKey = "graft.instantsToConsiderForNextSync"
  def deserialize(s: String): SyncMetadata = {
    val parts = s.split(";", -1)
    val pending =
      if (parts.length < 2 || parts(1).isEmpty) Seq.empty[Long]
      else parts(1).split(",").map(_.toLong).toSeq
    SyncMetadata(parts(0).toLong, pending)
  }
}

/**
 * A single commit's change set cannot be expressed in other formats
 * (deletion vectors, v2 delete files, MOR log blocks). Distinct from a
 * plain require so [[graft.sync.SyncEngine]]'s Auto mode can apply the
 * incremental safety fence — fall back to a full snapshot sync, which IS
 * expressible once the mutation has been purged/compacted — while an
 * explicit Incremental request still fails loudly.
 */
final class UnsyncableChangeException(msg: String)
  extends IllegalArgumentException(msg)

/**
 * A sync commit lost its compare-and-set: between planning (reading the
 * target's watermark + live files) and committing, another process
 * synced the same target. The plan is stale — committing it would
 * duplicate adds (double-counting rows on an Iceberg target) or regress
 * the watermark. [[graft.sync.SyncEngine.sync]] catches this and
 * re-plans from fresh target state.
 */
final class ConcurrentSyncException(msg: String)
  extends IllegalStateException(msg)

object ConcurrentSyncException {
  /** CAS guard for put-if-absent commits: a lost version/instant slot
    * throws TYPED — every entry point (sync plane AND single-shot
    * DDL/mutation) signals a commit race the same way, so a caller's
    * retry loop matches one structural type instead of broad
    * IllegalArgument/IllegalState patterns. */
  def check(won: Boolean, msg: => String): Unit =
    if (!won) throw new ConcurrentSyncException(msg)
}

/**
 * Compare-and-set guard carried by a sync commit: the watermark the
 * planner observed on the target for `sourceId` (`None` = no watermark
 * for this source). Each target validates it against CURRENT state in
 * the same read that allocates the commit's version slot, so the
 * version file's put-if-absent closes the validate→publish window: any
 * foreign commit landing after the read collides on the slot instead of
 * silently stacking a stale diff (two schedulers running one pipeline
 * is the reference's own deployment shape, ref
 * `core/.../client/OneTableClient.java:95-247` — which leaves this race
 * to the caller).
 */
final case class SyncCas(
    sourceId: String,
    /** The raw (source-id, version) watermark pair the planner observed
      * on the target — whatever source wrote it, `None` = no sync state
      * at all. Comparing the FULL pair (not just this source's slice)
      * distinguishes "never synced" from "last synced by a different
      * source": a fresh-target full plan must NOT validate against a
      * target another source synced in between (on a Hudi target no
      * version slot would arbitrate that stack), and a deliberate
      * source switch re-plans once and then commits against the
      * now-observed foreign pair. */
    observed: Option[(String, String)]) {
  def validate(state: Map[String, String], targetDesc: String): Unit = {
    val cur = for {
      s <- state.get(SyncCas.SourceIdProp)
      v <- state.get(SyncCas.VersionProp)
    } yield (s, v)
    if (cur != observed) throw new ConcurrentSyncException(
      s"concurrent sync detected on $targetDesc: planned for $sourceId against " +
        s"observed sync state $observed but the target now carries $cur — " +
        "re-plan and retry")
  }
}
object SyncCas {
  /** Canonical watermark property keys (aliased by SyncEngine). */
  val SourceIdProp = "graft.sync.source.id"
  val VersionProp = "graft.sync.last.synced.version"
  /** Puffin statistics pointer riding the sync property channel
    * (aliased by SyncEngine.StatsPathProp; promoted by the Iceberg
    * target to a metadata.json `statistics` entry). */
  val StatsPathProp = "graft.sync.stats.path"
  /** Partition-statistics pointer, same contract: promoted by the
    * Iceberg target to a `partition-statistics` entry. */
  val PartitionStatsPathProp = "graft.sync.partition-stats.path"
}
