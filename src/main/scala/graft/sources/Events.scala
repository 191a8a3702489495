package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The `events` table carries a nanosecond-precision parquet timestamp.
 * Spark's timestamp domain is microseconds; depending on
 * `spark.sql.legacy.parquet.nanosAsLong` the column surfaces as LONG
 * (nanos) or as a (NTZ) timestamp. Normalize to a microsecond
 * `TimestampType` column `ts_us` (truncation, matching DuckDB's
 * `epoch_us`/CAST-to-TIMESTAMP behavior) so every downstream operator is
 * engine-agnostic.
 */
object Events {
  def normalized(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.events(spark, sfDir)
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts_us", col("ts").cast(TimestampType))
      case _ =>
        raw.withColumn("ts_us", col("ts").cast(TimestampType))
    }
  }
}
