package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

import graft.iceberg.IcebergTable

/**
 * Statistics-DRIVEN join planning: the consumption half of the i21/i22
 * statistics plane. A warehouse planner reads the registered planning
 * facts — the Puffin blob's `ndv` property (the cross-engine
 * convention, ref the statistics registration the reference's Iceberg
 * target maintains via table metadata, `core/.../iceberg/
 * IcebergClient.java:178-202` property plumbing) and the
 * partition-statistics row counts — WITHOUT scanning a single data
 * row, and decides the physical join strategy from them.
 *
 * Why it matters at 100 TB: Spark's own broadcast decision is
 * size-in-bytes from the scan relation, which for a freshly-synced or
 * filtered dimension is often unknown or wildly conservative; the
 * table's registered ndv/row-count facts are metadata reads (one
 * metadata.json + one Puffin footer — a few KB) and survive across
 * engines. A wrong choice here is the difference between an O(rows)
 * broadcast of a 100-GB "dimension" melting the driver and a needless
 * full shuffle of a 100-TB fact against a 10-MB dimension.
 */
object StatsJoin {

  /** Planning facts for `table`, from registered statistics only (no
    * data scan): the key column's HLL ndv (closest analyzed ancestor's
    * Puffin blob property) and, when partition statistics exist, the
    * exact registered row count. */
  def plannedRows(table: IcebergTable, keyColumn: String): Option[Double] = {
    val ndv: Option[Double] =
      try {
        val (_, n) = table.statisticsRegisters(keyColumn)
        Some(n)
      } catch { case _: IllegalStateException | _: IllegalArgumentException => None }
    val pRows: Option[Double] = table.partitionStatisticsFor().map { e =>
      table.readPartitionStatistics(e)
        .groupBy().sum("data_record_count").collect()(0).getLong(0).toDouble
    }
    // partition stats carry EXACT row counts — prefer them; the key
    // ndv is the fallback (for a key column ndv ≈ rows), and the MAX of
    // the two is the safe cardinality estimate for a broadcast decision
    (pRows, ndv) match {
      case (Some(a), Some(b)) => Some(math.max(a, b))
      case (a, b) => a.orElse(b)
    }
  }

  /**
   * Join `fact` to the `dim` table on `condition`, choosing the
   * physical strategy from dim's REGISTERED statistics: estimated
   * cardinality at or below `broadcastRowThreshold` ⇒ explicit
   * `broadcast()` hint (Catalyst plans a BroadcastHashJoin regardless
   * of autoBroadcastJoinThreshold), above ⇒ plain join (shuffle). A dim
   * with NO registered statistics falls back to the plain join —
   * never broadcast on a guess.
   */
  def joinPlanned(
      fact: DataFrame,
      dim: IcebergTable,
      dimKeyColumn: String,
      condition: Column,
      joinType: String = "inner",
      broadcastRowThreshold: Double = 1e7): DataFrame = {
    val dimDF = dim.toDF()
    plannedRows(dim, dimKeyColumn) match {
      case Some(rows) if rows <= broadcastRowThreshold =>
        fact.join(broadcast(dimDF), condition, joinType)
      case _ =>
        fact.join(dimDF, condition, joinType)
    }
  }
}
