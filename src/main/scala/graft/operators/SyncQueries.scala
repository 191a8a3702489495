package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable
import graft.sources.Tables
import graft.sync.SyncEngine

/**
 * Format-to-format sync verification: each target table below is
 * produced BY [[graft.sync.SyncEngine]] — a full sync followed by an
 * incremental replay of later source commits — not by independent
 * conversion. Reading the sync-produced target must match DuckDB on the
 * original parquet, proving the translated metadata (files, partition
 * values, stats) is faithful — the reference's core guarantee (ref
 * `core/.../client/OneTableClient.java:95-247`,
 * IT shape `ITOneTableClient.java:748-813`).
 */
object SyncQueries {

  private object Fixtures {
    private val built = scala.collection.mutable.Map[String, String]()

    def dir(spark: org.apache.spark.sql.SparkSession, sfDir: String): String = synchronized {
      built.getOrElseUpdate(sfDir, {
        val name = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val root = Paths.get(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_sync", name).toString
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)

        // 1. Delta -> Iceberg: full sync of commit0 (even keys), then an
        //    incremental replay of commit1 (odd keys)
        val o = Tables.orders(spark, sfDir)
        val d2iSrc = DeltaTable.create(
          spark, s"$root/d2i_src", o.filter(col("o_orderkey") % 2 === 0))
        SyncEngine.sync(
          SyncEngine.deltaSource(d2iSrc), SyncEngine.icebergTarget(spark, s"$root/d2i_tgt"))
        d2iSrc.append(o.filter(col("o_orderkey") % 2 === 1), Seq.empty)
        val r1 = SyncEngine.sync(
          SyncEngine.deltaSource(d2iSrc), SyncEngine.icebergTarget(spark, s"$root/d2i_tgt"))
        require(r1.mode == "incremental", s"expected incremental d2i replay, got ${r1.mode}")

        // 2. Iceberg -> Delta: partitioned lineitem, partition values and
        //    stats must survive translation so the Delta scan still prunes
        val i2dSrc = IcebergTable.create(
          spark, s"$root/i2d_src", Tables.lineitem(spark, sfDir), Seq("l_returnflag"))
        SyncEngine.sync(
          SyncEngine.icebergSource(i2dSrc), SyncEngine.deltaTarget(spark, s"$root/i2d_tgt"))

        // 4. time-partitioned Delta (generated month column) -> Iceberg
        //    hidden month transform: the transform spec AND the
        //    partition values must survive translation
        val tpSrc = DeltaTable.create(
          spark, s"$root/tp_src", o, Seq("month(o_orderdate)"))
        SyncEngine.sync(
          SyncEngine.deltaSource(tpSrc), SyncEngine.icebergTarget(spark, s"$root/tp_tgt"))

        // 3. Hudi -> Iceberg: full then incremental across two instants
        val h2iSrc = HudiTable.create(
          spark, s"$root/h2i_src", o.filter(col("o_orderkey") % 2 === 0))
        SyncEngine.sync(
          SyncEngine.hudiSource(h2iSrc), SyncEngine.icebergTarget(spark, s"$root/h2i_tgt"))
        h2iSrc.append(o.filter(col("o_orderkey") % 2 === 1))
        val r3 = SyncEngine.sync(
          SyncEngine.hudiSource(h2iSrc), SyncEngine.icebergTarget(spark, s"$root/h2i_tgt"))
        require(r3.mode == "incremental", s"expected incremental h2i replay, got ${r3.mode}")

        // 5. tri-hop chain: the d2i Iceberg target re-syncs into a Hudi
        //    target — metadata translated twice, data files untouched
        SyncEngine.sync(
          SyncEngine.icebergSource(IcebergTable.forPath(spark, s"$root/d2i_tgt")),
          SyncEngine.hudiTarget(spark, s"$root/chain_tgt"))

        // 6. compaction fixtures: the same orders fragmented into 8
        //    small files per format, then compact()ed with sort
        //    clustering — one atomic replace commit each; reads must
        //    stay byte-identical to the original parquet
        val frag = o.repartition(8)
        val cd = DeltaTable.create(spark, s"$root/compact_delta", frag)
        require(cd.compact(sortBy = Seq("o_orderkey")).nonEmpty, "delta compact no-op")
        val ci = IcebergTable.create(spark, s"$root/compact_ice", frag)
        require(ci.compact(sortBy = Seq("o_orderkey")).nonEmpty, "iceberg compact no-op")
        val ch = HudiTable.create(spark, s"$root/compact_hudi", frag)
        require(ch.compact(sortBy = Seq("o_orderkey")).nonEmpty, "hudi compact no-op")

        // 7. DataSource round-trip: written AND read back through
        //    spark.read/write.format("graft") (format auto-detected)
        o.write.format("graft").option("format", "iceberg").save(s"$root/ds_tbl")

        // 8. schema drop + re-add replay (ref IcebergSchemaSync.java:46-135
        //    deletes-first): the Delta source drops o_totalprice, overwrites
        //    with narrower files, re-adds the name, appends wider files —
        //    the incremental sync replays each commit's OWN schema, so the
        //    Iceberg target retires the old field id before the re-add
        //    mints a fresh one
        val o3 = o.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val sdSrc = DeltaTable.create(spark, s"$root/sd_src",
          o3.filter(col("o_orderkey") % 3 === 0))
        SyncEngine.sync(
          SyncEngine.deltaSource(sdSrc), SyncEngine.icebergTarget(spark, s"$root/sd_tgt"))
        val narrow = StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType)))
        sdSrc.replaceSchema(narrow)
        sdSrc.overwrite(o3.filter(col("o_orderkey") % 3 === 1).drop("o_totalprice"), Seq.empty)
        sdSrc.replaceSchema(StructType(narrow.fields :+
          StructField("o_totalprice", DoubleType)))
        sdSrc.append(o3.filter(col("o_orderkey") % 3 === 2), Seq.empty)
        val r8 = SyncEngine.sync(
          SyncEngine.deltaSource(sdSrc), SyncEngine.icebergTarget(spark, s"$root/sd_tgt"))
        require(r8.mode == "incremental", s"expected incremental sd replay, got ${r8.mode}")

        // column-mapped source: mapping enabled, o_totalprice RENAMED
        // to price (rename is logical-only, so every parquet file —
        // old and new — physically carries o_totalprice), then more
        // rows appended under the new logical name; the Iceberg target
        // resolves the physical name through its name mapping
        val cmSrc = DeltaTable.create(spark, s"$root/cm_src",
          o3.filter(col("o_orderkey") % 2 === 0))
        cmSrc.enableColumnMapping()
        cmSrc.renameColumn("o_totalprice", "price")
        cmSrc.append(o3.filter(col("o_orderkey") % 2 === 1)
          .withColumnRenamed("o_totalprice", "price"), Seq.empty)
        val r9 = SyncEngine.sync(
          SyncEngine.deltaSource(cmSrc), SyncEngine.icebergTarget(spark, s"$root/cm_tgt"))
        require(r9.filesAdded > 0, s"x09 fixture: empty mapped sync: $r9")

        // 10. non-hive-layout Hudi source (DIR_HIERARCHY_PARTITION_VALUES:
        //     slash-delimited partition VALUES, no `key=` dirs — ref
        //     `api/.../storage/DataLayoutStrategy.java:29-33`) → Iceberg:
        //     partition values are recovered POSITIONALLY from the
        //     configured field list (ref
        //     `core/.../hudi/HudiPartitionValuesExtractor.java:47-118`),
        //     full sync then an incremental replay
        val nhSrc = HudiTable.create(spark, s"$root/nh_src",
          o.filter(col("o_orderkey") % 2 === 0), Seq("o_orderstatus"),
          hiveStylePartitioning = false)
        SyncEngine.sync(
          SyncEngine.hudiSource(nhSrc), SyncEngine.icebergTarget(spark, s"$root/nh_tgt"))
        nhSrc.append(o.filter(col("o_orderkey") % 2 === 1))
        val r10 = SyncEngine.sync(
          SyncEngine.hudiSource(nhSrc), SyncEngine.icebergTarget(spark, s"$root/nh_tgt"))
        require(r10.mode == "incremental", s"expected incremental nh replay, got ${r10.mode}")

        // 11. escapable partition values end to end: o_orderpriority
        //     holds '4-NOT SPECIFIED' (a space — hive-escaped on disk,
        //     percent-encoded in the Delta log) — full Delta sync into
        //     Iceberg, then an incremental replay; the regression net
        //     for the decoded-path contract (double-encoded log paths
        //     were unreadable)
        val escSrc = DeltaTable.create(spark, s"$root/esc_src",
          o.filter(col("o_orderkey") % 2 === 0), Seq("o_orderpriority"))
        SyncEngine.sync(
          SyncEngine.deltaSource(escSrc), SyncEngine.icebergTarget(spark, s"$root/esc_tgt"))
        escSrc.append(o.filter(col("o_orderkey") % 2 === 1), Seq.empty)
        val r11 = SyncEngine.sync(
          SyncEngine.deltaSource(escSrc), SyncEngine.icebergTarget(spark, s"$root/esc_tgt"))
        require(r11.mode == "incremental", s"expected incremental esc replay, got ${r11.mode}")

        // 12. MOR read-optimized sync (ref the reference's MOR contract,
        //     `website/docs/features-and-limitations.md:26-27` +
        //     `HudiDataFileExtractor.java:113-124` getLatestBaseFiles):
        //     an UNCOMPACTED MOR source syncs its base files only —
        //     upserted log mutations stay invisible, while insert base
        //     files (even from the same mixed deltacommit) and appends
        //     flow through. Full sync, then an incremental replay across
        //     the mixed upsert + append, into BOTH Delta and Iceberg.
        val om = o.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val morSrc = HudiTable.createMor(spark, s"$root/mor_src",
          om.filter(col("o_orderkey") % 2 === 0), "o_orderkey")
        SyncEngine.sync(SyncEngine.hudiSource(morSrc, readOptimized = true),
          SyncEngine.icebergTarget(spark, s"$root/mor_tgt_i"))
        SyncEngine.sync(SyncEngine.hudiSource(morSrc, readOptimized = true),
          SyncEngine.deltaTarget(spark, s"$root/mor_tgt_d"))
        // mixed deltacommit: k%4==0 are UPDATES (log blocks, invisible
        // under RO), k%4==1 are INSERTS (new base files, visible)
        morSrc.upsert(
          om.filter(col("o_orderkey") % 4 === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 100000.0)
            .unionByName(om.filter(col("o_orderkey") % 4 === 1)))
        morSrc.append(om.filter(col("o_orderkey") % 4 === 3))
        val r12i = SyncEngine.sync(SyncEngine.hudiSource(morSrc, readOptimized = true),
          SyncEngine.icebergTarget(spark, s"$root/mor_tgt_i"))
        require(r12i.mode == "incremental", s"expected incremental mor replay, got ${r12i.mode}")
        val r12d = SyncEngine.sync(SyncEngine.hudiSource(morSrc, readOptimized = true),
          SyncEngine.deltaTarget(spark, s"$root/mor_tgt_d"))
        require(r12d.mode == "incremental", s"expected incremental mor replay, got ${r12d.mode}")

        // 13. cross-format type widening: the Delta source widens
        //     l_linenumber int→long (metadata-only typeWidening commit,
        //     no data rewritten), then appends rows whose values exceed
        //     int range; the widen and the wide rows replay
        //     INCREMENTALLY into an Iceberg target (new schema-id, same
        //     field id), and the widened Iceberg table chains onward
        //     into a Hudi target — pre-widen narrow files, the widened
        //     schema, and the wide values all survive double translation
        val li13 = Tables.lineitem(spark, sfDir).select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        val wSrc = DeltaTable.create(spark, s"$root/widen_src",
          li13.filter(col("l_orderkey") % 2 === 0))
        SyncEngine.sync(
          SyncEngine.deltaSource(wSrc), SyncEngine.icebergTarget(spark, s"$root/widen_tgt"))
        wSrc.widenColumn("l_linenumber", LongType)
        wSrc.append(li13.filter(col("l_orderkey") % 2 === 1)
          .withColumn("l_linenumber", col("l_linenumber").cast(LongType) * 1000000000L),
          Seq.empty)
        val r13 = SyncEngine.sync(
          SyncEngine.deltaSource(wSrc), SyncEngine.icebergTarget(spark, s"$root/widen_tgt"))
        require(r13.mode == "incremental", s"expected incremental widen replay, got ${r13.mode}")
        SyncEngine.sync(
          SyncEngine.icebergSource(IcebergTable.forPath(spark, s"$root/widen_tgt")),
          SyncEngine.hudiTarget(spark, s"$root/widen_chain"))

        // 14. NESTED type widening through the chain: lineitem scalars
        //     packed into containers (struct s{x,y}, array-of-struct
        //     aos[{q,r}]); s.x and aos.element.q widen int→long via
        //     dot-path DDL (Iceberg keeps the nested field ids, Delta
        //     stamps typeChanges on the nested fields), wide rows land,
        //     and the nested widen + mixed-width files replay
        //     incrementally delta→iceberg→hudi
        def nested14(rows: org.apache.spark.sql.DataFrame, wide: Boolean) = {
          val x = if (wide) col("l_linenumber").cast(LongType) * 1000000000L
                  else col("l_linenumber").cast("int")
          val q = if (wide) col("l_partkey").cast(LongType) * 1000000000L
                  else col("l_partkey").cast("int")
          rows.select(
            col("l_orderkey"),
            struct(x.as("x"), col("l_returnflag").as("y")).as("s"),
            array(struct(q.as("q"), col("l_linestatus").as("r"))).as("aos"))
        }
        val li14 = Tables.lineitem(spark, sfDir)
        val nSrc = DeltaTable.create(spark, s"$root/nwiden_src",
          nested14(li14.filter(col("l_orderkey") % 2 === 0), wide = false))
        SyncEngine.sync(
          SyncEngine.deltaSource(nSrc), SyncEngine.icebergTarget(spark, s"$root/nwiden_tgt"))
        nSrc.widenColumn("s.x", LongType)
        nSrc.widenColumn("aos.element.q", LongType)
        nSrc.append(nested14(li14.filter(col("l_orderkey") % 2 === 1), wide = true), Seq.empty)
        val r14 = SyncEngine.sync(
          SyncEngine.deltaSource(nSrc), SyncEngine.icebergTarget(spark, s"$root/nwiden_tgt"))
        require(r14.mode == "incremental",
          s"expected incremental nested-widen replay, got ${r14.mode}")
        SyncEngine.sync(
          SyncEngine.icebergSource(IcebergTable.forPath(spark, s"$root/nwiden_tgt")),
          SyncEngine.hudiTarget(spark, s"$root/nwiden_chain"))

        // 15. clustered-layout sync (x15): a z-order CLUSTER rewrite on
        //     an Iceberg source flows through the sync plane as a
        //     REPLACE (adds + removes, replayed INCREMENTALLY) into
        //     Delta and Hudi targets — the targets end up mirroring the
        //     Morton-ordered files, inheriting the clustered layout's
        //     stats-skipping for free, and the source's declared sort
        //     order (metadata.json sort-orders) survives the sync reads
        val zSrc = IcebergTable.create(spark, s"$root/zorder_src",
          Tables.lineitem(spark, sfDir).repartition(16))
        SyncEngine.sync(
          SyncEngine.icebergSource(zSrc), SyncEngine.deltaTarget(spark, s"$root/zorder_tgt_d"))
        SyncEngine.sync(
          SyncEngine.icebergSource(zSrc), SyncEngine.hudiTarget(spark, s"$root/zorder_tgt_h"))
        require(zSrc.compact(targetFileBytes = 1L << 19, smallFileBytes = 1L << 30,
          zorderBy = Seq("l_partkey", "l_suppkey")).nonEmpty,
          "x15 fixture: zorder compact was a no-op")
        val rzd = SyncEngine.sync(
          SyncEngine.icebergSource(zSrc), SyncEngine.deltaTarget(spark, s"$root/zorder_tgt_d"))
        val rzh = SyncEngine.sync(
          SyncEngine.icebergSource(zSrc), SyncEngine.hudiTarget(spark, s"$root/zorder_tgt_h"))
        require(rzd.mode == "incremental" && rzh.mode == "incremental",
          s"x15 fixture: replace must replay incrementally, got ${rzd.mode}/${rzh.mode}")
        require(rzd.filesRemoved > 0 && rzh.filesRemoved > 0,
          "x15 fixture: the CLUSTER rewrite must flow as removals")
        require(IcebergTable.forPath(spark, s"$root/zorder_src").defaultSortOrder() ==
          ((Seq("l_partkey", "l_suppkey"), true)),
          "x15 fixture: sort order must survive the sync reads")

        // 16. statistics through the sync plane (x16): ANALYZE an
        //     Iceberg source, sync → the Iceberg target PROMOTES the
        //     Puffin pointer riding the property channel to a real
        //     `statistics` entry anchored at the target commit (the
        //     FILE stays source-owned and shared, like the data files);
        //     a later sync past the analyzed snapshot still resolves
        //     through the target's own closest-analyzed-ancestor walk
        val sSrc = IcebergTable.create(spark, s"$root/stats_src",
          Tables.orders(spark, sfDir))
        sSrc.writeStatistics(Seq("o_custkey"))
        SyncEngine.sync(SyncEngine.icebergSource(sSrc),
          SyncEngine.icebergTarget(spark, s"$root/stats_tgt"))
        val sTgt0 = IcebergTable.forPath(spark, s"$root/stats_tgt")
        require(sTgt0.statisticsFor().nonEmpty,
          "x16 fixture: Puffin pointer not promoted on the target")
        require(sTgt0.statisticsFor().get.snapshotId ==
          sTgt0.currentMetadata.currentSnapshotId.get,
          "x16 fixture: carried entry must anchor at the target commit")
        // source advances WITHOUT re-analyzing; the incremental sync
        // carries the same still-closest sketch to the new target head
        sSrc.append(Tables.orders(spark, sfDir).limit(0))
        val r16 = SyncEngine.sync(SyncEngine.icebergSource(sSrc),
          SyncEngine.icebergTarget(spark, s"$root/stats_tgt"))
        require(r16.mode == "incremental",
          s"x16 fixture: expected incremental stats carry, got ${r16.mode}")
        require(IcebergTable.forPath(spark, s"$root/stats_tgt")
          .statisticsFor().nonEmpty,
          "x16 fixture: stats lookup lost after the incremental sync")

        root
      })
    }
  }

  /** Fixture root (builds fixtures if needed). */
  def fixtureDir(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    Fixtures.dir(spark, sfDir)

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "x02_delta_to_iceberg_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        IcebergTable.forPath(spark, s"$root/d2i_tgt").toDF()
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

    // The Delta target's scan prunes on TRANSLATED partition values —
    // only the l_returnflag=A files are read.
    QueryDef.sql(
      "x03_iceberg_to_delta_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        DeltaTable.forPath(spark, s"$root/i2d_tgt")
          .scan.partitionIn("l_returnflag", Set("A")).toDF()
          .groupBy(col("l_linestatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
          .orderBy(col("l_linestatus"))
      },
      """SELECT l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    QueryDef.sql(
      "x04_hudi_to_iceberg_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        IcebergTable.forPath(spark, s"$root/h2i_tgt").toDF()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("key_sum"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // The Iceberg target of a time-partitioned Delta sync prunes months
    // via TRANSLATED transform partition values (Delta generated-column
    // strings -> Iceberg spec ordinals).
    QueryDef.sql(
      "x05_time_partitioned_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        IcebergTable.forPath(spark, s"$root/tp_tgt")
          .scan.partitionIn("o_orderdate_month", Set("1996-03", "1996-04")).toDF()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') IN ('1996-03', '1996-04')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Two sync hops (Delta -> Iceberg -> Hudi) over the SAME data files:
    // the end of the chain must still answer identically to DuckDB on
    // the original parquet.
    QueryDef.sql(
      "x06_chained_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        HudiTable.forPath(spark, s"$root/chain_tgt").toDF()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("key_sum"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Compaction equality: after bin-packing + sort clustering, all
    // three formats must still answer identically to DuckDB on the
    // original parquet — the maintenance op may never change results.
    QueryDef.sql(
      "x07_compacted_tri_equality",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        def summarize(df: org.apache.spark.sql.DataFrame, fmt: String) =
          df.groupBy(col("o_orderstatus"))
            .agg(
              count(lit(1)).as("cnt"),
              sum(col("o_orderkey")).as("key_sum"),
              sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
            .withColumn("fmt", lit(fmt))
        summarize(DeltaTable.forPath(spark, s"$root/compact_delta").toDF(), "delta")
          .unionAll(summarize(HudiTable.forPath(spark, s"$root/compact_hudi").toDF(), "hudi"))
          .unionAll(summarize(IcebergTable.forPath(spark, s"$root/compact_ice").toDF(), "iceberg"))
          .select(col("fmt"), col("o_orderstatus"), col("cnt"), col("key_sum"), col("sum_price"))
          .orderBy(col("fmt"), col("o_orderstatus"))
      },
      """SELECT fmt, o_orderstatus, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM (SELECT 'delta' AS fmt UNION ALL SELECT 'hudi' UNION ALL SELECT 'iceberg') fmts, orders
        |GROUP BY fmt, o_orderstatus ORDER BY fmt, o_orderstatus""".stripMargin),

    // Schema drops replay onto the target: after the source dropped,
    // overwrote, re-added, and appended, the target's rows from files
    // written while the column was dropped read back NULL — never the
    // resurrected old values (the re-added column is a NEW field id).
    QueryDef.sql(
      "x08_schema_drop_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        IcebergTable.forPath(spark, s"$root/sd_tgt").toDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            count(col("o_totalprice")).as("price_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  COUNT(o_totalprice) AS price_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 1
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 2
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Column-mapped Delta source → Iceberg target: the files physically
    // carry the pre-rename column name; the target's name mapping must
    // resolve the renamed logical column for BOTH vintages of files.
    QueryDef.sql(
      "x09_column_mapped_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        IcebergTable.forPath(spark, s"$root/cm_tgt").toDF()
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("price").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Non-hive (value-only) partition layout Hudi source → Iceberg: the
    // slash-delimited partition values survived the sync, and the
    // TARGET's scan prunes on them — only o_orderstatus='O' files read.
    QueryDef.sql(
      "x10_nonhive_layout_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        IcebergTable.forPath(spark, s"$root/nh_tgt")
          .scan.partitionIn("o_orderstatus", Set("O")).toDF()
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // The registered DataSource: a table written AND read back through
    // format("graft") answers identically to DuckDB on the source rows.
    QueryDef.sql(
      "f11_datasource_roundtrip",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        spark.read.format("graft").load(s"$root/ds_tbl")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // Escapable partition values survive the whole sync chain: the
    // priority-partitioned target scans (including the space-valued
    // '4-NOT SPECIFIED' partition) and prunes on the escaped value.
    QueryDef.sql(
      "x11_escaped_partition_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        IcebergTable.forPath(spark, s"$root/esc_tgt")
          .scan.partitionIn("o_orderpriority", Set("4-NOT SPECIFIED", "1-URGENT")).toDF()
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('4-NOT SPECIFIED', '1-URGENT')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // MOR read-optimized sync: both targets hold every order key at its
    // ORIGINAL price — the k%4==0 price updates live only in log files
    // the RO view skips, while the same deltacommit's insert base files
    // (k%4==1) and the later append (k%4==3) arrived incrementally. The
    // oracle is therefore the plain orders table: any leaked log
    // mutation (or dropped base file) breaks the sums.
    QueryDef.sql(
      "x12_mor_readoptimized_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        def agg(df: org.apache.spark.sql.DataFrame, tag: String) = df
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .withColumn("target", lit(tag))
        agg(IcebergTable.forPath(spark, s"$root/mor_tgt_i").toDF(), "iceberg")
          .unionByName(agg(DeltaTable.forPath(spark, s"$root/mor_tgt_d").toDF(), "delta"))
          .orderBy(col("target"), col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  'delta' AS target
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT o_orderstatus, COUNT(*),
        |  CAST(SUM(o_orderkey) AS BIGINT),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        |  'iceberg'
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY target, o_orderstatus""".stripMargin),

    // Cross-format type widening, double-translated: a metadata-only
    // int→long widen on the Delta source rides the incremental feed to
    // an Iceberg target and chains onward into Hudi; the narrow
    // pre-widen files and the beyond-int-range post-widen values must
    // read exactly under the widened schema at the END of the chain.
    QueryDef.sql(
      "x13_type_widen_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        HudiTable.forPath(spark, s"$root/widen_chain").toDF()
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("l_linenumber")).as("sum_ln"),
            max(col("l_linenumber")).as("max_ln"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN CAST(l_linenumber AS BIGINT)
        |                ELSE CAST(l_linenumber AS BIGINT) * 1000000000 END) AS BIGINT) AS sum_ln,
        |  CAST(MAX(CASE WHEN l_orderkey % 2 = 0 THEN CAST(l_linenumber AS BIGINT)
        |                ELSE CAST(l_linenumber AS BIGINT) * 1000000000 END) AS BIGINT) AS max_ln
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // Nested widening through the chain: the Hudi end of a
    // delta→iceberg→hudi sync reads container-nested columns whose
    // struct-field and array-element-struct-field types widened
    // mid-history — the flattened aggregate must agree with a plain
    // relational replay of the packed scalars.
    QueryDef.sql(
      "x14_nested_widen_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        HudiTable.forPath(spark, s"$root/nwiden_chain").toDF()
          .select(
            col("s.y").as("sy"),
            col("s.x").as("sx"),
            element_at(col("aos"), 1).getField("q").as("q"))
          .groupBy(col("sy"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("sx")).as("sum_x"),
            max(col("sx")).as("max_x"),
            sum(col("q")).as("sum_q"))
          .orderBy(col("sy"))
      },
      """SELECT l_returnflag AS sy, COUNT(*) AS cnt,
        |  CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN CAST(l_linenumber AS BIGINT)
        |                ELSE CAST(l_linenumber AS BIGINT) * 1000000000 END) AS BIGINT) AS sum_x,
        |  CAST(MAX(CASE WHEN l_orderkey % 2 = 0 THEN CAST(l_linenumber AS BIGINT)
        |                ELSE CAST(l_linenumber AS BIGINT) * 1000000000 END) AS BIGINT) AS max_x,
        |  CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN CAST(l_partkey AS BIGINT)
        |                ELSE CAST(l_partkey AS BIGINT) * 1000000000 END) AS BIGINT) AS sum_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // Clustered-layout sync: the z-order CLUSTER rewrite on the Iceberg
    // source flowed into both targets as an incremental REPLACE
    // (adds + removes), so each target mirrors the Morton-ordered
    // files — a 2-d box read over the TARGETS must equal DuckDB on the
    // raw lineitem, proving the replace lost and duplicated nothing
    // while handing the targets the clustered layout's stats-skipping.
    QueryDef.sql(
      "x15_clustered_layout_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        def box(df: org.apache.spark.sql.DataFrame, tag: String) = df
          .filter(col("l_partkey").between(100, 400) && col("l_suppkey").between(10, 40))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
          .withColumn("target", lit(tag))
        box(DeltaTable.forPath(spark, s"$root/zorder_tgt_d")
            .scan.range("l_partkey", Some(100L), Some(400L))
            .range("l_suppkey", Some(10L), Some(40L)).toDF(), "delta")
          .unionByName(box(HudiTable.forPath(spark, s"$root/zorder_tgt_h")
            .scan.range("l_partkey", Some(100L), Some(400L))
            .range("l_suppkey", Some(10L), Some(40L)).toDF(), "hudi"))
          .orderBy(col("target"), col("l_returnflag"))
      },
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  'delta' AS target
        |FROM lineitem WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 40
        |GROUP BY l_returnflag
        |UNION ALL
        |SELECT l_returnflag, COUNT(*),
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 'hudi'
        |FROM lineitem WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 40
        |GROUP BY l_returnflag
        |ORDER BY target, l_returnflag""".stripMargin),

    // Statistics through the sync plane: the TARGET's own
    // closest-analyzed-ancestor lookup (two sync commits past the
    // analyzed source snapshot) resolves the carried Puffin sketch,
    // whose register replay must match DuckDB's from-raw-data HLL —
    // proving the promoted entry points at the right file and the
    // target chain anchors it correctly.
    QueryDef.sql(
      "x16_stats_sync",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        val t = IcebergTable.forPath(spark, s"$root/stats_tgt")
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

    // The streaming change feed, end to end: drain a two-commit table
    // through spark.readStream.format("graft") (snapshot batch + one
    // incremental batch) into a memory sink — the union of batches must
    // equal the full table, proving offset arithmetic loses and
    // duplicates nothing.
    QueryDef.sql(
      "f12_stream_changes_read",
      (spark, dir) => {
        val root = Fixtures.dir(spark, dir)
        val sink = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val q = spark.readStream.format("graft").load(s"$root/d2i_src")
          .writeStream.format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(300000)
        spark.table(sink)
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      """SELECT o_orderstatus, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  )
}
