package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The repo's engine-portable HyperLogLog (m = 256, md5-based): register
 * construction and estimation as SQL expression strings shared VERBATIM
 * between the q35 sketch query, its DuckDB oracle, and the Iceberg
 * Puffin statistics writer — one arithmetic, three consumers, so a
 * register set persisted in a statistics file replays bit-identically
 * from raw data. Buckets come from the first two md5 nibbles; rho is
 * the leading-zero count of the 14-nibble tail + 1 (max 57); the
 * estimator is standard HLL with alpha-256, registers fixed-point at
 * 2^60.
 */
object PortableHll {

  val M = 256
  /** 2^60, the fixed-point scale of the register terms. */
  val Scale = "1.152921504606846976e18"

  /** bucket of the md5 hex column `h` (first two nibbles). */
  val bucketSql: String =
    "(instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
      "instr('0123456789abcdef', substr(h, 2, 1)) - 1"

  /** rho = leading-zero bits of the 14-hex-char tail (`rest`) + 1, via
    * nibble arithmetic shared verbatim with the oracle. */
  val rhoSql: String =
    """CASE WHEN length(regexp_extract(rest, '^0*', 0)) = 14 THEN 57
      |ELSE 4 * length(regexp_extract(rest, '^0*', 0))
      |  + (CASE
      |       WHEN instr('0123456789abcdef', substr(rest, length(regexp_extract(rest, '^0*', 0)) + 1, 1)) - 1 >= 8 THEN 0
      |       WHEN instr('0123456789abcdef', substr(rest, length(regexp_extract(rest, '^0*', 0)) + 1, 1)) - 1 >= 4 THEN 1
      |       WHEN instr('0123456789abcdef', substr(rest, length(regexp_extract(rest, '^0*', 0)) + 1, 1)) - 1 >= 2 THEN 2
      |       ELSE 3 END) + 1 END""".stripMargin

  /** The raw alpha-m estimator over an `sp` (fixed-point register sum
    * of present buckets) / `nb` (present-bucket count) pair. */
  val rawEstimateSql: String =
    s"""0.7213e0 / (1.0e0 + 1.079e0 / 2.56e2) * 6.5536e4 * $Scale /
       |  cast(sp + cast($M - nb as decimal(38,0)) * 1152921504606846976 as double)"""
      .stripMargin

  /** Estimate from an `sp`/`nb` pair, rounded to 2 dp — standard HLL
    * with the LINEAR-COUNTING small-range branch (Flajolet et al. 2007
    * §4: when zero registers exist and the raw estimate ≤ 2.5·m, use
    * m·ln(m/V), V = zero-register count). The branch IS cross-engine
    * portable despite ln(): V is an integer in [1, 256], so the
    * correction has only 255 possible values, and the nearest any of
    * them comes to a 2-dp rounding boundary is 1.7e-6 — nine orders of
    * magnitude above a 1-ulp libm disagreement (verified exhaustively
    * against DuckDB's ln). An nb = 0 register set (all-NULL column)
    * estimates 0. */
  val estimateSql: String =
    s"""CASE WHEN nb = 0 THEN 0.0e0
       |WHEN nb < $M AND $rawEstimateSql <= 640.0e0
       |THEN round(2.56e2 * ln(2.56e2 / cast($M - nb as double)), 2)
       |ELSE round($rawEstimateSql, 2) END""".stripMargin

  /** (bucket, mr) register rows of one column (nulls excluded — ndv is
    * the non-null distinct count, the cross-engine convention). */
  def registers(df: DataFrame, c: Column): DataFrame =
    df.select(md5(c.cast("string")).as("h"))
      .where(c.isNotNull)
      .withColumn("bucket", expr(bucketSql))
      .withColumn("rest", expr("substr(h, 3, 14)"))
      .withColumn("rho", expr(rhoSql))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("mr"))

  /** ONE-pass register build for MANY columns (the ANALYZE shape shared
    * by the Iceberg and Delta writers): every column's hash stacks into
    * (ci, h) rows row-side, registers shrink to ≤ cols×256 rows in the
    * map-side combine, and the driver collects only those — one table
    * scan regardless of column count. Returns registers by column
    * index; an absent index is an all-NULL column. */
  def stackedRegisters(df: DataFrame, cols: Seq[String]): Map[Int, Seq[(Int, Int)]] =
    df.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("ci"), md5(col(c).cast("string")).as("h"))
      }: _*)).as("s"))
      .select(col("s.ci").as("ci"), col("s.h").as("h"))
      .where(col("h").isNotNull) // md5(NULL) is NULL: ndv counts non-nulls
      .withColumn("bucket", expr(bucketSql))
      .withColumn("rest", expr("substr(h, 3, 14)"))
      .withColumn("rho", expr(rhoSql))
      .groupBy(col("ci"), col("bucket"))
      .agg(max(col("rho")).as("mr"))
      .collect()
      .groupBy(_.getInt(0)).view.mapValues(
        _.map(r => (r.getInt(1), r.getInt(2))).toSeq).toMap

  /** One-row estimate frame (column `est`) from a register frame. */
  def estimate(regs: DataFrame): DataFrame =
    regs.agg(count(lit(1)).as("nb"),
        sum(expr("cast(shiftleft(cast(1 as bigint), 60 - mr) as decimal(38,0))")).as("sp"))
      .select(expr(estimateSql).as("est"))

  /** DRIVER-SIDE estimate from collected (bucket, mr) registers —
    * bit-identical to [[estimateSql]] (the decimal register sum, the
    * left-to-right double arithmetic, Spark's BigDecimal HALF_UP
    * round), so an ANALYZE that already holds the ≤256 collected
    * registers never pays a second distributed job for trivial
    * arithmetic. */
  def estimateLocal(regs: Seq[(Int, Int)]): Double = {
    val nb = regs.size
    if (nb == 0) return 0.0
    // round exactly as Spark's Round does for DoubleType
    def r2(x: Double): Double =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sp = regs.map { case (_, mr) => BigInt(1) << (60 - mr) }.sum
    val z = (BigDecimal(sp) + BigDecimal(M - nb) * BigDecimal(BigInt(1) << 60)).toDouble
    val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 1.152921504606846976e18 / z
    if (nb < M && raw <= 640.0) r2(256.0 * math.log(256.0 / (M - nb)))
    else r2(raw)
  }
}
