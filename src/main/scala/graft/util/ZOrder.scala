package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering for multi-dimension file skipping —
 * the layout behind Delta Lake's `OPTIMIZE ZORDER BY`: interleaving the
 * bits of several columns' bucket ranks places rows that are close in
 * EVERY dimension into the same files, so min/max stats prune
 * multi-column range predicates where a lexicographic sort only prunes
 * its leading column.
 *
 * Scale shape: one min/max aggregation job over the rewrite set, then a
 * purely arithmetic (codegen'd) z-value projection and a range
 * repartition on it — no windows, no global sort of raw columns.
 * Buckets are uniform on [min, max] (8 bits/dimension), which is the
 * right trade for clustering: rank-exact quantiles would cost a global
 * sort and buy nothing once values land in file-sized buckets.
 */
object ZOrder {

  private val Bits = 8

  /** Interleaved z-value column over numeric/date/timestamp columns
    * (2-4 dims practical; 8 bits each). `ranges` are (min, max) per
    * column, usually from [[arrange]]'s stats pass. */
  def zvalue(cols: Seq[String], ranges: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty && cols.size == ranges.size)
    val buckets = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
        floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(1 << Bits)).cast("int"),
        lit(0)), lit((1 << Bits) - 1))
    }
    val n = cols.size
    val pieces = for {
      b <- 0 until Bits
      (bk, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk, b).bitwiseAND(lit(1)), b * n + i)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Rewrite-set arrangement: range-repartition on the z-value into `n`
    * outputs (each file covers a compact multi-dimensional region). */
  def arrange(df: DataFrame, cols: Seq[String], n: Int): DataFrame = {
    val stats = df.select(cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double")))): _*).head()
    val ranges = cols.indices.map(i =>
      (Option(stats.get(2 * i)).fold(0.0)(_.asInstanceOf[Double]),
        Option(stats.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])))
    df.withColumn("__graft_z", zvalue(cols, ranges))
      .repartitionByRange(n, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }
}
