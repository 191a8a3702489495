package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Mergeable sketch operators. At 100 TB an exact COUNT(DISTINCT) is a
 * full shuffle of every distinct value; the sketch shape reduces each
 * partition to a fixed-size register array that merges by max — the
 * same reason the reference's stats plane carries min/max/null-count
 * summaries per file instead of values (SURVEY.md §2.5).
 *
 * The HyperLogLog here is deliberately engine-portable and fully
 * deterministic (Flajolet et al. 2007, the public HLL paper): the hash
 * is md5 hex (both engines agree byte-for-byte), registers are derived
 * by string/integer ops only, and the harmonic sum is computed in
 * DECIMAL(38,0) over exact powers of two — no float accumulation
 * order, no libm — so the DuckDB oracle replays the estimator exactly,
 * which a native HLL (Spark's approx_count_distinct, DuckDB's
 * approx sketches) cannot do across engines.
 *
 * Register math (m = 256, p = 8): bucket = first two hex nibbles;
 * rho = leading-zero count of the next 56 bits + 1 (so rho ∈ [1, 57]);
 * the per-bucket term 2^-rho is tracked as the exact integer
 * 2^(60-rho), empty buckets contribute 2^60, and the final estimate is
 * alpha_256 * m^2 / Z in one double division — plus the standard
 * small-range linear-counting branch (m·ln(m/V) when zero registers
 * exist and the raw estimate ≤ 2.5·m). ln() IS portable here: the
 * branch has only 255 possible inputs and none lands within 1e-6 of a
 * 2-dp rounding boundary (PortableHll.estimateSql documents the
 * exhaustive check), so both engines round identically.
 */
object Sketches {

  // register/estimator arithmetic lives in graft.functions.PortableHll,
  // shared verbatim with the Iceberg Puffin statistics writer (i21) so
  // a persisted sketch replays bit-identically from raw data
  private val rhoSql = graft.functions.PortableHll.rhoSql

  /**
   * Distinct customers per order priority AND overall, each estimated
   * by the portable HLL beside its exact count. The 'ALL' row is NOT
   * re-hashed: it is the per-group register sets merged by max — the
   * mergeability that makes the sketch the 100 TB answer (registers
   * roll up across partitions/groups/days without touching rows
   * again).
   */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val registers = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"),
        md5(col("o_custkey").cast("string")).as("h"))
      .withColumn("bucket", expr(
        "(instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + instr('0123456789abcdef', substr(h, 2, 1)) - 1"))
      .withColumn("rest", expr("substr(h, 3, 14)"))
      .withColumn("rho", expr(rhoSql))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("mr"))

    def estimate(level: DataFrame): DataFrame = level
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("nb"),
        sum(expr("cast(shiftleft(cast(1 as bigint), 60 - mr) as decimal(38,0))")).as("sp"))
      .select(col("grp"),
        expr(graft.functions.PortableHll.estimateSql).as("est_distinct"))

    val perGroup = estimate(registers)
    val merged = estimate(
      registers.groupBy(col("bucket")).agg(max(col("mr")).as("mr"))
        .withColumn("grp", lit("ALL")))
    val exact = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
      .unionByName(Tables.orders(spark, dir)
        .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        .withColumn("grp", lit("ALL")))
    perGroup.unionByName(merged)
      .join(exact, Seq("grp"))
      .select(col("grp"), col("est_distinct"), col("exact_distinct"))
      .orderBy(col("grp"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q35_hll_distinct_sketch",
      hllDistinct,
      s"""WITH h AS (
         |  SELECT o_orderpriority AS grp, md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
         |b AS (
         |  SELECT grp,
         |    (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS bucket,
         |    substr(h, 3, 14) AS rest
         |  FROM h),
         |r AS (
         |  SELECT grp, bucket,
         |    ${rhoSql.replace("regexp_extract(rest, '^0*', 0)", "regexp_extract(rest, '^0*')")} AS rho
         |  FROM b),
         |l1 AS (SELECT grp, bucket, MAX(rho) AS mr FROM r GROUP BY grp, bucket),
         |lall AS (SELECT 'ALL' AS grp, bucket, MAX(mr) AS mr FROM l1 GROUP BY bucket),
         |lv AS (SELECT * FROM l1 UNION ALL SELECT * FROM lall),
         |est AS (
         |  SELECT grp, COUNT(*) AS nb,
         |    SUM(CAST((1::BIGINT << (60 - mr)) AS DECIMAL(38,0))) AS sp
         |  FROM lv GROUP BY grp),
         |e2 AS (
         |  SELECT grp,
         |    ${graft.functions.PortableHll.estimateSql} AS est_distinct
         |  FROM est),
         |x AS (
         |  SELECT o_orderpriority AS grp, COUNT(DISTINCT o_custkey) AS exact_distinct
         |  FROM orders GROUP BY 1
         |  UNION ALL
         |  SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM orders)
         |SELECT e2.grp, est_distinct, CAST(exact_distinct AS BIGINT) AS exact_distinct
         |FROM e2 JOIN x ON e2.grp = x.grp ORDER BY e2.grp""".stripMargin)
  )
}
