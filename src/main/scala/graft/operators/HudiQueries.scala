package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.hudi.{HudiCommitMetadata, HudiInstant, HudiLogFormat, HudiTable, HudiWriteStat}
import graft.sources.Tables

/**
 * Hudi-format verification queries: every query routes through the
 * native Hudi timeline codec (convert → .hoodie instants → file-slice
 * replay → read) and must produce rows identical to DuckDB on the
 * original parquet — completing the three-format matrix the reference
 * guarantees (ref `ITOneTableClient.java:748-813`). x04 asserts the
 * tri-format equality directly: the same source served through the
 * Delta, Iceberg, and Hudi codecs must agree row-for-row.
 */
object HudiQueries {

  private object Fixtures {
    private val built = scala.collection.mutable.Map[String, String]()

    def dir(spark: org.apache.spark.sql.SparkSession, sfDir: String): String = synchronized {
      built.getOrElseUpdate(sfDir, {
        val name = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val root = Paths.get(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_hudi", name).toString
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)

        // 1. metadata-only conversion of lineitem
        HudiTable.convertFromParquet(
          spark, s"$sfDir/lineitem.parquet", s"$root/converted_lineitem")

        // 2. two-commit orders table: c0 = even orderkeys, c1 += odd
        val o = Tables.orders(spark, sfDir)
        val t2 = HudiTable.create(
          spark, s"$root/orders_2commit", o.filter(col("o_orderkey") % 2 === 0))
        t2.append(o.filter(col("o_orderkey") % 2 === 1))

        // 3. lineitem hive-partitioned by l_returnflag
        HudiTable.create(
          spark, s"$root/lineitem_part",
          Tables.lineitem(spark, sfDir), Seq("l_returnflag"))

        // 4. replacecommit: open orders overwrite the full table
        val t4 = HudiTable.create(
          spark, s"$root/orders_replaced", o.filter(col("o_orderkey") % 2 === 0))
        t4.overwrite(o.filter(col("o_orderstatus") === "O"))

        // 5. rollback replayed INCREMENTALLY through a cross-format sync:
        //    sync even orders, sync the odd-orders commit, roll it back,
        //    sync again — the rollback instant must flow through the
        //    change feed as removals (ref HudiDataFileExtractor.java:207-223),
        //    not fall back to a full re-sync
        import graft.sync.SyncEngine
        val t5 = HudiTable.create(
          spark, s"$root/orders_rolled", o.filter(col("o_orderkey") % 2 === 0))
        val iceTarget = s"$root/orders_rolled_ice"
        SyncEngine.sync(SyncEngine.hudiSource(t5), SyncEngine.icebergTarget(spark, iceTarget))
        t5.append(o.filter(col("o_orderkey") % 2 === 1))
        SyncEngine.sync(SyncEngine.hudiSource(t5), SyncEngine.icebergTarget(spark, iceTarget))
        t5.rollback()
        val afterRollback = SyncEngine.sync(
          SyncEngine.hudiSource(t5), SyncEngine.icebergTarget(spark, iceTarget))
        require(afterRollback.mode == "incremental" && afterRollback.filesRemoved > 0,
          s"h06 fixture: rollback must replay incrementally with removals, got $afterRollback")

        // 6. range-clustered lineitem: disjoint l_orderkey ranges per
        //    file, so the col_stats index can prove files out of range
        HudiTable.create(spark, s"$root/lineitem_ranged",
          Tables.lineitem(spark, sfDir).repartitionByRange(8, col("l_orderkey")))

        // 7. avro-name stress: every column name is illegal in Avro
        //    (dash, leading digit, unicode), plus a nested struct and an
        //    array — the schema travels through the Avro commit-metadata
        //    channel, so sanitize + original-name restore must hold at
        //    every nesting level (ref AvroSchemaConverter.java name
        //    handling, HudiSchemaExtractor.java:56-61)
        HudiTable.create(spark, s"$root/orders_avro_names",
          o.select(
            col("o_orderkey").as("order-key"),
            col("o_orderstatus").as("0status"),
            struct(
              col("o_custkey").as("cust-key"),
              col("o_orderpriority").as("pri-orité")).as("meta-rec"),
            array(col("o_orderkey"), col("o_custkey")).as("key-list")))

        // 8. merge-on-read: create → upsert (update keys %3==0, insert
        //    shifted copies of keys %100==0) → tombstone keys %5==0.
        //    h09 reads the merged snapshot, h10 the read-optimized view
        //    (base files only — updates and deletes invisible, inserted
        //    base files visible); h11 compacts a same-shaped table and
        //    reads it back
        def buildMor(path: String): HudiTable = {
          val t = HudiTable.createMor(
            spark, path, o.repartition(4), "o_orderkey")
          t.upsert(o.filter(col("o_orderkey") % 3 === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 100000.0))
          t.upsert(o.filter(col("o_orderkey") % 100 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
          t.deleteKeys(o.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"))
          t
        }
        buildMor(s"$root/orders_mor")
        buildMor(s"$root/orders_mor_compacted").compactMor()

        // 8b. record-level index (h14): build the record_index metadata
        //     partition, then run EXACT-routed mutations through it —
        //     update, tombstone, compaction, post-compaction inserts —
        //     with the coverage fence intact at every step
        val t8b = HudiTable.createMor(
          spark, s"$root/orders_mor_rli", o.repartition(4), "o_orderkey")
        t8b.buildRecordIndex()
        t8b.upsert(o.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 50000.0))
        t8b.deleteKeys(o.filter(col("o_orderkey") % 11 === 0).select("o_orderkey"))
        t8b.compactMor()
        t8b.upsert(o.filter(col("o_orderkey") % 50 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 20000000L))
        require(t8b.recordIndexUsable(),
          "h14 fixture: the record index must stay covered through the mutations")

        // 8c. foreign-writer DELETE log block (h15): a single-group MOR
        //     table gets a v3 (avro HoodieDeleteRecordList) delete block
        //     appended by hand, exactly as a real Hudi writer would
        val t8c = HudiTable.createMor(
          spark, s"$root/orders_mor_delblock", o.coalesce(1), "o_orderkey")
        locally {
          val slice = t8c.fileSlices(None).head
          val victims = o.filter(col("o_orderkey") % 9 === 0)
            .select("o_orderkey").collect().map(_.getLong(0).toString).toSeq
          val inst = t8c.timeline.nextInstantTime()
          val logName = HudiLogFormat.logFileName(slice.fileId, slice.baseInstant, 1)
          val rel = if (slice.partitionPath.isEmpty) logName
            else s"${slice.partitionPath}/$logName"
          val logPath = new org.apache.hadoop.fs.Path(s"$root/orders_mor_delblock", rel)
          val lfs = logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val size = HudiLogFormat.write(lfs, logPath, Seq(HudiLogFormat.LogBlock(
            HudiLogFormat.DeleteBlock,
            Map(HudiLogFormat.HeaderInstantTime -> inst),
            HudiLogFormat.encodeDeleteBlock(victims.map((_, slice.partitionPath))))))
          require(t8c.timeline.commit(HudiInstant(inst, "deltacommit"), HudiCommitMetadata(
            partitionToWriteStats = Map(slice.partitionPath -> Seq(HudiWriteStat(
              fileId = slice.fileId, path = rel,
              prevCommit = slice.baseInstant, numWrites = victims.size.toLong,
              fileSizeInBytes = size))),
            partitionToReplaceFileIds = Map.empty,
            extraMetadata = Map.empty,
            operationType = "DELETE")), "h15 fixture: delete-block deltacommit lost a race")
        }

        // 9. savepointed timeline (h13): savepoint the two-commit state,
        //    append junk, roll the junk back (allowed: not savepointed),
        //    verify the savepointed instant itself REFUSES rollback —
        //    reads over a savepoint-bearing timeline must be unaffected
        //    (real Hudi protects savepointed history; the sync backlog
        //    ignores savepoints, ref HudiClient.java:233-252)
        val t9 = HudiTable.create(
          spark, s"$root/orders_savepointed", o.filter(col("o_orderkey") % 2 === 0))
        t9.append(o.filter(col("o_orderkey") % 2 === 1))
        t9.savepoint(None)
        t9.append(o.limit(100).withColumn("o_orderkey", col("o_orderkey") + 5000000L))
        t9.rollback() // junk commit is not savepointed: allowed
        val blocked = // the savepointed instant must refuse revocation
          try { t9.rollback(); false }
          catch { case e: IllegalArgumentException => e.getMessage.contains("savepointed") }
        require(blocked, "h13 fixture: rollback of a savepointed instant must fail")

        // 10. z-order clustering (h16): lineitem fragmented into 16
        //     scattered files, then zorder-compacted on
        //     (l_partkey, l_suppkey) — Hudi's clustering shape, a
        //     CLUSTER replacecommit whose rewritten base files carry
        //     Morton-interleaved layout, so the col_stats index prunes
        //     2-d boxes where a lexicographic sort only prunes its
        //     leading column. Completes the cross-format layout trio
        //     (f24 Delta, i20 Iceberg); pruning fractions pinned by
        //     CompactionSpec's hudi mirror.
        val t10 = HudiTable.create(spark, s"$root/lineitem_zorder",
          Tables.lineitem(spark, sfDir).repartition(16))
        require(t10.compact(targetFileBytes = 1L << 19, smallFileBytes = 1L << 30,
          zorderBy = Seq("l_partkey", "l_suppkey")).nonEmpty,
          "h16 fixture: zorder compact was a no-op")

        // 11. statistics plane on Hudi (h17): native ANALYZE lands a
        //     Puffin sidecar under .hoodie/.graft_stats + an
        //     extraMetadata pointer; a later append must leave the
        //     registration resolvable (walk-back read)
        val t11 = HudiTable.create(spark, s"$root/orders_stats", o)
        t11.writeStatistics(Seq("o_custkey", "o_orderkey"))
        t11.append(o.limit(0))

        root
      })
    }

    def table(spark: org.apache.spark.sql.SparkSession, sfDir: String, name: String): HudiTable =
      HudiTable.forPath(spark, s"${dir(spark, sfDir)}/$name")
  }

  /** Fixture root (builds fixtures if needed). */
  def fixtureDir(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    Fixtures.dir(spark, sfDir)

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "h01_hudi_convert_read",
      (spark, dir) =>
        Fixtures.table(spark, dir, "converted_lineitem").toDF()
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
          .orderBy(col("l_returnflag")),
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    QueryDef.sql(
      "h02_hudi_time_travel",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "orders_2commit")
        t.toDF(asOf = Some(t.instants.head))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderkey % 2 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    QueryDef.sql(
      "h03_hudi_incremental_changes",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "orders_2commit")
        val is = t.instants
        t.changesAsDF(is(0), is(1))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey""".stripMargin),

    QueryDef.sql(
      "h04_hudi_partition_prune",
      (spark, dir) =>
        Fixtures.table(spark, dir, "lineitem_part").scan
          .partitionIn("l_returnflag", Set("A"))
          .toDF()
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
          .orderBy(col("l_linestatus")),
      """SELECT l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    QueryDef.sql(
      "h05_hudi_overwrite_replacecommit",
      (spark, dir) =>
        Fixtures.table(spark, dir, "orders_replaced").toDF()
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderpriority")),
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    QueryDef.sql(
      "h06_hudi_rollback_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        val src = Fixtures.table(spark, dir, "orders_rolled").toDF()
        val tgt = graft.iceberg.IcebergTable.forPath(spark, s"$root/orders_rolled_ice").toDF()
        def summarize(df: org.apache.spark.sql.DataFrame, fmt: String) =
          df.groupBy(col("o_orderstatus"))
            .agg(
              count(lit(1)).as("cnt"),
              sum(col("o_orderkey")).as("key_sum"),
              sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
            .withColumn("fmt", lit(fmt))
        summarize(src, "hudi").unionAll(summarize(tgt, "iceberg"))
          .select(col("fmt"), col("o_orderstatus"), col("cnt"), col("key_sum"), col("sum_price"))
          .orderBy(col("fmt"), col("o_orderstatus"))
      },
      """SELECT fmt, o_orderstatus, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM (SELECT 'hudi' AS fmt UNION ALL SELECT 'iceberg') fmts, orders
        |WHERE o_orderkey % 2 = 0
        |GROUP BY fmt, o_orderstatus ORDER BY fmt, o_orderstatus""".stripMargin),

    // min/max file skipping through the col_stats index (ref
    // `HudiFileStatsExtractor.java:96-103`); the row filter applies on
    // the surviving files, so dropped files must be provably outside
    QueryDef.sql(
      "h07_hudi_stats_skipping",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "lineitem_ranged")
        t.scan.range("l_orderkey", Some(1000L), Some(2000L)).toDF()
          .filter(col("l_orderkey") >= 1000 && col("l_orderkey") <= 2000)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // the schema here only exists in the commit's Avro metadata — a
    // correct read proves the Avro↔StructType converter restores the
    // exact Spark names (incl. nested) that Avro itself cannot represent
    QueryDef.sql(
      "h08_hudi_avro_schema_names",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "orders_avro_names")
        t.toDF()
          .select(
            col("order-key").as("order_key"),
            col("0status").as("status"),
            col("meta-rec").getField("cust-key").as("cust_key"),
            col("meta-rec").getField("pri-orité").as("priority"),
            element_at(col("key-list"), 2).as("second_key"))
          .orderBy(col("order_key"))
      },
      """SELECT o_orderkey AS order_key, o_orderstatus AS status,
        |  o_custkey AS cust_key, o_orderpriority AS priority,
        |  o_custkey AS second_key
        |FROM orders ORDER BY order_key""".stripMargin),

    // Merge-on-read snapshot: base rows + AVRO_DATA log blocks merged
    // per record key (latest deltacommit wins), `_hoodie_is_deleted`
    // tombstones dropped. The oracle reconstructs update+insert+delete
    // algebraically over the raw parquet (beyond the reference, whose
    // MOR reads are the base-file view only).
    QueryDef.sql(
      "h09_hudi_mor_snapshot",
      (spark, dir) =>
        Fixtures.table(spark, dir, "orders_mor").toDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus")),
      """WITH snap AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM snap GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // The read-optimized view of the same table: log mutations
    // (updates, tombstones) invisible; base files written by the
    // upsert's INSERT path visible — exactly the view the reference
    // syncs for MOR sources.
    QueryDef.sql(
      "h10_hudi_mor_read_optimized",
      (spark, dir) =>
        Fixtures.table(spark, dir, "orders_mor").readOptimizedDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus")),
      """WITH ro AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM ro GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // MOR compaction (replacecommit): logs folded into fresh base
    // files; the merged snapshot result is unchanged and the table is
    // base-only again.
    QueryDef.sql(
      "h11_hudi_mor_compaction",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "orders_mor_compacted")
        require(!t.hasLogFiles(), "h11 fixture must be fully compacted")
        t.toDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      """WITH snap AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM snap GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // MOR change feed: the log blocks ARE the change stream — upsert
    // post-images, `_hoodie_is_deleted` tombstones (key only, data
    // columns null), and insert base files, each tagged with its
    // deltacommit instant.
    QueryDef.sql(
      "h12_hudi_mor_change_feed",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "orders_mor")
        t.changeFeed(t.instants.head, t.latestInstant)
          .groupBy(col("_change_type"), col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("_change_type"), col("o_orderstatus"))
      },
      """WITH feed AS (
        |  SELECT 'upsert' AS _change_type, o_orderkey, o_orderstatus,
        |    o_totalprice + 100000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT 'insert', o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT 'delete', o_orderkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT _change_type, o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM feed GROUP BY _change_type, o_orderstatus
        |ORDER BY _change_type, o_orderstatus""".stripMargin),

    // Savepointed timeline: after savepoint + junk-append + rollback
    // (and a REFUSED rollback of the savepointed instant), the snapshot
    // still answers exactly the pre-junk state — savepoints are timeline
    // no-ops for reads and diffs, fences for destructive maintenance.
    QueryDef.sql(
      "h13_hudi_savepoint",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "orders_savepointed")
        t.toDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Record-level index (RFC-37): every mutation in the fixture routed
    // by EXACT key->fileId lookups from the record_index metadata
    // partition (the fixture requires the coverage fence held) — and the
    // final table still answers identically to DuckDB's replay of the
    // same mutations over the raw orders.
    QueryDef.sql(
      "h14_hudi_record_index_upsert",
      (spark, dir) =>
        Fixtures.table(spark, dir, "orders_mor_rli").toDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus")),
      """WITH snap AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 50 = 0)
        |SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM snap GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Foreign-writer DELETE log block: the merged snapshot applies the
    // v3 avro tombstone list a real Hudi writer appends — the read
    // answers as if the keys were deleted by any other means.
    QueryDef.sql(
      "h15_hudi_delete_block_read",
      (spark, dir) =>
        Fixtures.table(spark, dir, "orders_mor_delblock").toDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus")),
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderkey % 9 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Z-order clustering through the NATIVE hudi writer: the CLUSTER
    // replacecommit replaced the 16 scattered files with Morton-ordered
    // ones, and a 2-d box predicate prunes on the col_stats index's
    // per-file min/max (scan.range twice — the pruning fractions are
    // pinned by CompactionSpec's hudi mirror); the residual row filter
    // keeps the answer exact.
    QueryDef.sql(
      "h16_hudi_zorder_clustering",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "lineitem_zorder")
        t.scan
          .range("l_partkey", Some(100L), Some(400L))
          .range("l_suppkey", Some(10L), Some(40L)).toDF()
          .filter(col("l_partkey").between(100, 400) && col("l_suppkey").between(10, 40))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 40
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // The statistics plane on HUDI (third format beside i21 and f25):
    // the ANALYZE sidecar's register set — resolved through the commit
    // extraMetadata walk-back, one follow-up append later — must replay
    // to DuckDB's from-raw-data HLL exactly.
    QueryDef.sql(
      "h17_hudi_statistics",
      (spark, dir) => {
        val t = Fixtures.table(spark, dir, "orders_stats")
        val (regs, ndv) = t.statisticsRegisters("o_custkey")
        graft.functions.PortableHll.estimate(
            spark.createDataFrame(regs).toDF("bucket", "mr"))
          .select(lit("o_custkey").as("column_name"),
            col("est").as("est_distinct"), lit(ndv).as("ndv_property"))
          .join(t.toDF().agg(countDistinct(col("o_custkey")).as("exact_distinct"))
            .withColumn("column_name", lit("o_custkey")), Seq("column_name"))
          .select(col("column_name"), col("est_distinct"),
            col("ndv_property"), col("exact_distinct"))
      },
      s"""WITH reg AS (
         |  SELECT bucket, MAX(rho) AS mr FROM (
         |    SELECT
         |      (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS bucket,
         |      ${graft.functions.PortableHll.rhoSql.replace("regexp_extract(rest, '^0*', 0)", "regexp_extract(rest, '^0*')")} AS rho
         |    FROM (
         |      SELECT md5(CAST(o_custkey AS VARCHAR)) AS h,
         |        substr(md5(CAST(o_custkey AS VARCHAR)), 3, 14) AS rest
         |      FROM orders WHERE o_custkey IS NOT NULL))
         |  GROUP BY bucket),
         |est AS (
         |  SELECT COUNT(*) AS nb,
         |    SUM(CAST((1::BIGINT << (60 - mr)) AS DECIMAL(38,0))) AS sp
         |  FROM reg),
         |e2 AS (
         |  SELECT ${graft.functions.PortableHll.estimateSql} AS est_distinct
         |  FROM est)
         |SELECT 'o_custkey' AS column_name, est_distinct,
         |  est_distinct AS ndv_property,
         |  CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT) AS exact_distinct
         |FROM e2""".stripMargin),

    QueryDef.sql(
      "x04_tri_format_equality",
      (spark, dir) => {
        val hud = Fixtures.table(spark, dir, "converted_lineitem").toDF()
        val ice = graft.iceberg.IcebergTable.forPath(
          spark, IcebergQueries.fixtureDir(spark, dir) + "/converted_lineitem").toDF()
        val del = graft.delta.DeltaTable.forPath(
          spark, FormatQueries.fixtureDir(spark, dir) + "/converted_lineitem").toDF()
        def summarize(df: org.apache.spark.sql.DataFrame, fmt: String) =
          df.groupBy(col("l_returnflag"))
            .agg(
              count(lit(1)).as("cnt"),
              sum(col("l_orderkey")).as("key_sum"),
              sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
            .withColumn("fmt", lit(fmt))
        summarize(del, "delta").unionAll(summarize(hud, "hudi")).unionAll(summarize(ice, "iceberg"))
          .select(col("fmt"), col("l_returnflag"), col("cnt"), col("key_sum"), col("sum_qty"))
          .orderBy(col("fmt"), col("l_returnflag"))
      },
      """SELECT fmt, l_returnflag, COUNT(*) AS cnt, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM (SELECT 'delta' AS fmt UNION ALL SELECT 'hudi' UNION ALL SELECT 'iceberg') fmts, lineitem
        |GROUP BY fmt, l_returnflag ORDER BY fmt, l_returnflag""".stripMargin)
  )
}
