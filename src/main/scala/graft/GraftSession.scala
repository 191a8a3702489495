package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's standard tuning. Sized for the test
 * harness (local[N]) but every knob is the one we'd set on a real
 * cluster: AQE for runtime re-planning (skew joins, partition
 * coalescing), shuffle partitions matched to parallelism, UTC, and
 * nanos-as-long so nanosecond parquet timestamps surface losslessly.
 */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // iceberg data files carry field ids in their footers
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.TextHashes.register(s)
    s
  }
}
