package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the events feed: the same
 * event-time operators the batch plane exposes (q28–q30), expressed as
 * micro-batch pipelines with watermarks — `readStream` → transform →
 * windowed agg / custom session state (SURVEY.md §2.9 Spark mapping).
 *
 * Scale notes: all state is keyed and bounded by the watermark — window
 * state expires `delay` past the window end, session state is dropped
 * on event-time timeout. Nothing accumulates unboundedly, which is the
 * property that lets these run forever on a real cluster.
 */
object EventStreams {

  /** Streaming read of an events directory (file micro-batch source),
    * with the same nanos/NTZ → microsecond-timestamp normalization the
    * batch reader applies. */
  def read(spark: SparkSession, inputDir: String): DataFrame = {
    val schema = spark.read.parquet(inputDir).schema
    val raw = spark.readStream.schema(schema).parquet(inputDir)
    val ts = schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case _        => col("ts").cast(TimestampType)
    }
    raw.withColumn("ts_us", ts)
  }

  /** Hourly tumbling counts per event type with a 1-hour event-time
    * watermark (late events beyond the delay are dropped, window state
    * is reclaimed — the unbounded-state guard). */
  def hourlyCounts(spark: SparkSession, inputDir: String): DataFrame =
    read(spark, inputDir)
      .withWatermark("ts_us", "1 hour")
      .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("cnt"), col("sum_value"))

  /**
   * Streaming ingest dedup: at-least-once delivery (replays, retried
   * producers) collapsed to exactly-once rows by event_id. The
   * `dropDuplicatesWithinWatermark` variant is the 100 TB shape: dedup
   * state is dropped once the watermark passes an id's event time, so
   * state size tracks the delay horizon, not the stream's lifetime —
   * the unbounded-state guard a plain dropDuplicates lacks. Duplicates
   * delivered farther apart than the horizon are the (documented)
   * at-most-horizon contract every streaming dedup at scale accepts.
   */
  def dedupe(spark: SparkSession, inputDir: String, horizon: String = "1 hour"): DataFrame =
    read(spark, inputDir)
      .withWatermark("ts_us", horizon)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value"))

  /**
   * Stream-stream interval join: each click joins the SAME user's
   * purchases within the following 30 minutes — both sides unbounded
   * streams, so the join is stateful and BOTH watermarks plus the
   * interval condition bound the state (Spark drops a side's rows once
   * the other's watermark passes the join range — without the time
   * bound, stream-stream join state grows forever; this is the shape
   * that runs indefinitely at event-firehose scale).
   */
  def clickPurchaseJoin(spark: SparkSession, inputDir: String): DataFrame = {
    val events = read(spark, inputDir)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts_us").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "30 minutes")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
  }

  final case class Evt(user_id: Long, ts_us: Timestamp, value: Double)
  final case class SessionState(startUs: Long, lastUs: Long, cnt: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, session_start: Timestamp, cnt: Long, sum_value: Double)

  /**
   * Custom sessionization with explicit state: per-user sessions closed
   * after 10 minutes of event-time inactivity, emitted on timeout —
   * the `flatMapGroupsWithState` shape for semantics `session_window`
   * can't express (e.g. carrying running aggregates across emissions).
   */
  def sessionize(spark: SparkSession, inputDir: String): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = 10L * 60 * 1000000

    // java.sql.Timestamp splits sub-second precision across getTime
    // (ms) and getNanos — combine/rebuild so microseconds round-trip
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def fromMicros(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def fn(userId: Long, events: Iterator[Evt],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      var cur = state.getOption
      def close(s: SessionState): Unit =
        out ::= SessionOut(userId, fromMicros(s.startUs), s.cnt, s.sum)
      if (state.hasTimedOut) {
        cur.foreach(close)
        state.remove()
        return out.iterator
      }
      events.toSeq.sortBy(e => micros(e.ts_us)).foreach { e =>
        val us = micros(e.ts_us)
        cur match {
          case Some(s) if us - s.lastUs < gapUs =>
            cur = Some(s.copy(lastUs = us, cnt = s.cnt + 1, sum = s.sum + e.value))
          case other =>
            other.foreach(close)
            cur = Some(SessionState(us, us, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes the inactivity gap
        state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000)
      }
      out.iterator
    }

    read(spark, inputDir)
      .select(col("user_id"), col("ts_us"), col("value"))
      .withWatermark("ts_us", "0 seconds")
      .as[Evt]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
