package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EventStreamsSpec extends SparkTestBase {

  /** Batch-truth twin of EventStreams' ts normalization: the generated
    * events table has carried `ts` as BOTH epoch-millis long and
    * timestamp across driver rounds — adapt like the source does. */
  private def withTsUs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      case _ => df.withColumn("ts_us", col("ts").cast("timestamp"))
    }

  /** Stage the single-file events table as a 2-file directory so the
    * file source produces two micro-batches (watermark advances between
    * them, which is what lets event-time timeouts fire). */
  private def stageEvents(): String = {
    val dir = tmpDir("stream_events")
    val src = spark.read.parquet(s"$sf0001/events.parquet").orderBy("ts")
    val n = src.count()
    src.limit((n / 2).toInt).coalesce(1)
      .write.parquet(s"$dir/in_tmp1")
    src.orderBy(col("ts").desc).limit((n - n / 2).toInt).coalesce(1)
      .write.parquet(s"$dir/in_tmp2")
    val in = Paths.get(dir, "in")
    Files.createDirectories(in)
    var i = 0
    Seq("in_tmp1", "in_tmp2").foreach { d =>
      Files.list(Paths.get(dir, d)).filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.move(f, in.resolve(f"part$i%03d.parquet"), StandardCopyOption.ATOMIC_MOVE)
        i += 1
      }
    }
    in.toString
  }

  test("streaming hourly window agg matches the batch computation") {
    val in = stageEvents()
    val q = EventStreams.hourlyCounts(spark, in)
      .writeStream
      .format("memory")
      .queryName("hourly_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ckpt_hourly"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_stream")
      .orderBy("hour", "event_type").collect().toSeq
    val batch = withTsUs(spark.read.parquet(in))
      .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming dedup drops replayed deliveries, in-batch and across batches") {
    val dir = tmpDir("stream_dedup")
    val src = spark.read.parquet(s"$sf0001/events.parquet").orderBy("ts")
    val n = src.count()
    val firstHalf = src.limit((n / 2).toInt)
    val secondHalf = src.orderBy(col("ts").desc).limit((n - n / 2).toInt)
    // batch 1: first half plus an in-batch replay of every 10th event;
    // batch 2: second half plus a cross-batch replay of batch 1's tail
    // (those replays land well inside the 1-hour watermark horizon)
    val tailOfFirst = firstHalf.orderBy(col("ts").desc).limit(20)
    firstHalf.unionByName(firstHalf.filter(col("event_id") % 10 === 0))
      .coalesce(1).write.parquet(s"$dir/in_tmp1")
    secondHalf.unionByName(tailOfFirst)
      .coalesce(1).write.parquet(s"$dir/in_tmp2")
    val in = Paths.get(dir, "in")
    Files.createDirectories(in)
    var i = 0
    Seq("in_tmp1", "in_tmp2").foreach { d =>
      Files.list(Paths.get(dir, d)).filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.move(f, in.resolve(f"part$i%03d.parquet"), StandardCopyOption.ATOMIC_MOVE)
        i += 1
      }
    }
    val q = EventStreams.dedupe(spark, in.toString)
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt_dedup"))
      .option("maxFilesPerTrigger", "1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    import spark.implicits._
    val emitted = spark.table("dedup_stream").select("event_id").as[Long].collect().toSeq
    val expected = spark.read.parquet(in.toString)
      .select("event_id").distinct().as[Long].collect().toSeq
    assert(emitted.size === emitted.distinct.size,
      "a replayed delivery slipped through the dedup state")
    assert(emitted.toSet === expected.toSet,
      "dedup emitted a different id set than the batch distinct")
  }

  test("stream-stream interval join matches the batch range join") {
    val in = stageEvents()
    val q = EventStreams.clickPurchaseJoin(spark, in)
      .writeStream
      .format("memory")
      .queryName("ssj_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt_ssj"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    import spark.implicits._
    val streamed = spark.table("ssj_stream")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    val e = withTsUs(spark.read.parquet(in))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts_us").as("purchase_ts"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty, "the interval join emitted nothing")
    assert(streamed == batch)
  }

  test("stateful sessionization emits watermark-closed sessions matching batch islands") {
    val in = stageEvents()
    import spark.implicits._
    val q = EventStreams.sessionize(spark, in)
      .writeStream
      .format("memory")
      .queryName("session_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt_sess"))
      .option("maxFilesPerTrigger", "1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val emitted = spark.table("session_stream")
      .select("user_id", "session_start", "cnt").as[(Long, java.sql.Timestamp, Long)]
      .collect().toSet
    // batch truth: gaps-and-islands sessions per user
    val batchSessions = withTsUs(spark.read.parquet(in))
      .selectExpr("user_id", "ts_us", "value")
      .withColumn("prev", lag("ts_us", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts_us")))
      .withColumn("brk", when(col("prev").isNull ||
        unix_micros(col("ts_us")) - unix_micros(col("prev")) >= 600000000L, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts_us")))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("session_start"), count(lit(1)).as("cnt"))
      .select("user_id", "session_start", "cnt").as[(Long, java.sql.Timestamp, Long)]
      .collect().toSet
    assert(emitted.nonEmpty, "no sessions closed — watermark never advanced")
    // every emitted (closed) session must be a true batch session;
    // tail sessions past the final watermark legitimately stay open
    assert(emitted.subsetOf(batchSessions))
  }
}
