package graft.hudi

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Merge-on-read: log-format codec, deltacommit timeline, upsert
  * routing, merged snapshot reads, tombstone deletes, compaction,
  * partition pruning, and sync-plane guards. */
class HudiMorSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def keys(t: HudiTable): Seq[Long] =
    t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq

  // ------------------------------------------------------------ log codec

  test("command blocks revoke rolled-back data blocks; delete blocks fail loudly") {
    val dir = tmpDir("mor_cmd")
    val fs = new Path(dir).getFileSystem(new Configuration())
    def data(inst: String, payload: Byte) = HudiLogFormat.LogBlock(
      HudiLogFormat.AvroDataBlock,
      Map(HudiLogFormat.HeaderInstantTime -> inst), Array[Byte](payload))
    // rollback of a NAMED target instant revokes exactly its blocks
    val p1 = new Path(dir, ".f1_001.log.1_0-0-0")
    HudiLogFormat.write(fs, p1, Seq(
      data("001", 1), data("002", 2),
      HudiLogFormat.LogBlock(HudiLogFormat.CommandBlock,
        Map(HudiLogFormat.HeaderTargetInstantTime -> "002",
          HudiLogFormat.HeaderCommandBlockType -> "0"), Array.emptyByteArray),
      data("003", 3)))
    val eff1 = HudiLogFormat.dataBlocks(fs, p1)
    assert(eff1.map(_.content.head).toSeq == Seq[Byte](1, 3))
    // a command block with no target revokes the preceding block
    val p2 = new Path(dir, ".f1_001.log.2_0-0-0")
    HudiLogFormat.write(fs, p2, Seq(
      data("001", 1),
      HudiLogFormat.LogBlock(HudiLogFormat.CommandBlock,
        Map(HudiLogFormat.HeaderCommandBlockType -> "0"), Array.emptyByteArray)))
    assert(HudiLogFormat.dataBlocks(fs, p2).isEmpty)
    // an undecodable DELETE block must error, never silently skip
    val p3 = new Path(dir, ".f1_001.log.3_0-0-0")
    HudiLogFormat.write(fs, p3, Seq(
      data("001", 1),
      HudiLogFormat.LogBlock(HudiLogFormat.DeleteBlock,
        Map(HudiLogFormat.HeaderInstantTime -> "002"), Array[Byte](0, 0, 0, 1))))
    val err = intercept[IllegalStateException](HudiLogFormat.dataBlocks(fs, p3))
    assert(err.getMessage.contains("DELETE log block"))
  }

  test("log format round-trips blocks, tolerates a torn tail") {
    val dir = tmpDir("mor_log")
    val path = new Path(dir, ".f1_001.log.1_0-0-0")
    val fs = path.getFileSystem(new Configuration())
    val b1 = HudiLogFormat.LogBlock(HudiLogFormat.AvroDataBlock,
      Map(HudiLogFormat.HeaderInstantTime -> "001"), Array[Byte](1, 2, 3))
    val b2 = HudiLogFormat.LogBlock(HudiLogFormat.AvroDataBlock,
      Map(HudiLogFormat.HeaderInstantTime -> "002",
        HudiLogFormat.HeaderSchema -> "{}"), Array[Byte](9))
    HudiLogFormat.write(fs, path, Seq(b1, b2))
    val back = HudiLogFormat.readBlocks(fs, path)
    assert(back.size == 2)
    assert(back(0).content.toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).headers(HudiLogFormat.HeaderSchema) == "{}")
    // a torn tail block (crashed writer): good bytes + magic + truncated
    // length, written as a fresh file
    val good = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path.toUri.getPath))
    val torn = new Path(dir, ".f1_001.log.2_0-0-0")
    java.nio.file.Files.write(java.nio.file.Paths.get(torn.toString),
      good ++ HudiLogFormat.Magic ++ Array[Byte](0, 0))
    assert(HudiLogFormat.readBlocks(fs, torn).size == 2)
  }

  test("log file name round-trip") {
    val n = HudiLogFormat.logFileName("abc-123", "20260813010101000", 4)
    assert(HudiLogFormat.parseLogFileName(n).contains(("abc-123", "20260813010101000", 4)))
    assert(HudiLogFormat.isLogPath(s"st=A/$n"))
  }

  // --------------------------------------------------------------- upsert

  test("upsert updates existing rows via log blocks; base files untouched") {
    val dir = tmpDir("mor_upsert")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(4), "o_orderkey")
    val basePaths = t.fileSlices().map(_.basePath).toSet
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100000.0))
    assert(t.fileSlices().map(_.basePath).toSet == basePaths) // no base rewrite
    assert(t.hasLogFiles())
    val got = t.toDF().filter(col("o_orderkey") % 3 === 0)
      .agg(min(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(got >= 100000.0)
    assert(t.toDF().count() == orders.count()) // updates, not duplicates
  }

  test("upsert inserts brand-new keys as base files") {
    val dir = tmpDir("mor_insert")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    // orderkeys start at 0, so the boundary is inclusive
    val fresh = orders.limit(10).withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    t.upsert(fresh)
    assert(t.toDF().count() == orders.count() + 10)
    assert(t.toDF().filter(col("o_orderkey") >= 10000000L).count() == 10)
  }

  test("upsert routing prunes slices by record-key range; answers stay exact") {
    val dir = tmpDir("mor_keyprune")
    // 8 range-clustered base files → disjoint o_orderkey ranges in the
    // col_stats index
    val t = HudiTable.createMor(spark, s"$dir/t",
      orders.repartitionByRange(8, col("o_orderkey")), "o_orderkey")
    val all = t.fileSlices().size
    assert(all >= 8)
    // a narrow key band must route through a strict subset of slices
    val narrow = orders.orderBy(col("o_orderkey")).limit(20)
      .withColumn("o_totalprice", col("o_totalprice") + 100000.0)
    val cands = t.upsertCandidateSlices(narrow, "o_orderkey",
      org.apache.spark.sql.types.LongType)
    assert(cands.size < all,
      s"expected key-range pruning: ${cands.size} of $all slices")
    // and the real upsert through the pruned routing is exact
    t.upsert(narrow)
    assert(t.toDF().count() == orders.count())
    val updatedKeys = narrow.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val gotMin = t.toDF().filter(col("o_orderkey").isInCollection(updatedKeys))
      .agg(min(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(gotMin >= 100000.0, s"updated keys not routed: min price $gotMin")
    // keys outside every range still insert (no candidate file)
    val fresh = orders.limit(3).withColumn("o_orderkey", col("o_orderkey") + 30000000L)
    t.upsert(fresh)
    assert(t.toDF().count() == orders.count() + 3)
  }

  test("small-mutation merge routes cold keys around the window; heavy merge falls back") {
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(walk)
    }
    def hasAntiJoin(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.count()
      walk(df.queryExecution.executedPlan).exists {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          b.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti
        case _ => false
      }
    }
    // ROUTED: a handful of mutated keys against a full base — log bytes
    // are a clear minority, so cold base rows must bypass the merge
    // window via the broadcast anti-join, and the result is exact
    val dir = tmpDir("mor_route")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(2), "o_orderkey")
    val mutated = orders.orderBy(col("o_orderkey")).limit(5)
      .withColumn("o_totalprice", col("o_totalprice") + 100000.0)
    t.upsert(mutated)
    val snap = t.toDF()
    assert(hasAntiJoin(snap), "small-mutation MOR read must take the routed shape")
    assert(snap.count() == orders.count())
    val mutKeys = mutated.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val expMut = mutated.agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    val gotMut = snap.filter(col("o_orderkey").isInCollection(mutKeys))
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(math.abs(gotMut - expMut) < 1e-6, "hot keys must carry the log values")
    val expCold = orders.filter(!col("o_orderkey").isInCollection(mutKeys))
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    val gotCold = snap.filter(!col("o_orderkey").isInCollection(mutKeys))
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(math.abs(gotCold - expCold) < 1e-6, "cold keys must keep base values")
    // FALLBACK: mutate every key — log bytes rival base bytes, the
    // routed shape would scan base twice for nothing, so the read keeps
    // the whole-window merge (no anti-join) and stays exact
    val dir2 = tmpDir("mor_heavy")
    val t2 = HudiTable.createMor(spark, s"$dir2/t", orders.repartition(2), "o_orderkey")
    t2.upsert(orders.withColumn("o_totalprice", col("o_totalprice") + 100000.0))
    val snap2 = t2.toDF()
    assert(!hasAntiJoin(snap2), "mutation-heavy MOR read must keep the window shape")
    assert(snap2.count() == orders.count())
    assert(snap2.agg(min(col("o_totalprice"))).collect()(0).getDouble(0) >= 100000.0)
  }

  test("second upsert of the same keys wins (latest instant)") {
    val dir = tmpDir("mor_twice")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val target = orders.filter(col("o_orderkey") % 5 === 0)
    t.upsert(target.withColumn("o_orderstatus", lit("X")))
    t.upsert(target.withColumn("o_orderstatus", lit("Y")))
    val statuses = t.toDF().filter(col("o_orderkey") % 5 === 0)
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("Y"))
    assert(t.toDF().count() == orders.count())
  }

  test("all-absent deleteKeys and empty upserts are commit-free no-ops") {
    val dir = tmpDir("mor_noop")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val v0 = t.latestInstant
    val n0 = t.toDF().count()
    import spark.implicits._
    // every key absent → documented "absent keys are ignored", and no
    // commit lands (previously this threw "matched no rows")
    assert(t.deleteKeys(Seq(99999991L, 99999992L).toDF("o_orderkey")) == v0)
    // an empty frame is equally a no-op
    assert(t.upsert(orders.limit(0)) == v0)
    assert(t.latestInstant == v0, "no-op batches must not commit")
    assert(t.toDF().count() == n0)
  }

  test("deleteKeys tombstones rows; absent keys are no-ops") {
    val dir = tmpDir("mor_delete")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(2), "o_orderkey")
    val all = keys(t)
    import spark.implicits._
    t.deleteKeys((all.filter(_ % 7 == 0) :+ 99999999L).toDF("o_orderkey"))
    assert(keys(t) == all.filterNot(_ % 7 == 0))
  }

  test("time travel reads the pre-upsert snapshot") {
    val dir = tmpDir("mor_tt")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val v0 = t.latestInstant
    t.upsert(orders.limit(50).withColumn("o_orderstatus", lit("Z")))
    assert(t.toDF(Some(v0)).filter(col("o_orderstatus") === "Z").count() == 0)
    assert(t.toDF().filter(col("o_orderstatus") === "Z").count() == 50)
  }

  test("partitioned MOR: upsert routes to the right groups; partition pruning works") {
    val dir = tmpDir("mor_part")
    val t = HudiTable.createMor(
      spark, s"$dir/t", orders, "o_orderkey", Seq("o_orderstatus"))
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    val p = t.scan.partitionIn("o_orderstatus", Set("F")).toDF()
    val expect = orders.filter(col("o_orderstatus") === "F").count()
    assert(p.count() == expect)
    assert(p.filter(col("o_orderkey") % 4 === 0 && col("o_totalprice") =!= 1.0).count() == 0)
  }

  test("compactMor folds logs into base files; data identical; sync accepted") {
    val dir = tmpDir("mor_compact")
    val t = HudiTable.createMor(spark, s"$dir/t", orders.repartition(3), "o_orderkey")
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 5.0))
    import spark.implicits._
    t.deleteKeys(keys(t).filter(_ % 10 == 0).toDF("o_orderkey"))
    val expect = t.toDF().orderBy("o_orderkey").collect().toSeq
    intercept[IllegalArgumentException](t.snapshotDataFiles())
    assert(t.compactMor().nonEmpty)
    assert(!t.hasLogFiles())
    assert(t.toDF().orderBy("o_orderkey").collect().toSeq == expect)
    assert(t.snapshotDataFiles().nonEmpty)
    assert(t.compactMor().isEmpty)
  }

  test("deltacommit appending logs is refused by the incremental sync feed") {
    val dir = tmpDir("mor_changes")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val inst = t.upsert(orders.limit(20).withColumn("o_orderstatus", lit("Q")))
    intercept[IllegalArgumentException](t.changeSet(inst))
  }

  test("sync feeds deltacommits: insert-only flows, log-writing fails loudly") {
    import graft.sync.SyncEngine
    val dir = tmpDir("mor_sync")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val target = s"$dir/ice"
    SyncEngine.sync(SyncEngine.hudiSource(t), SyncEngine.icebergTarget(spark, target))
    // insert-only upsert (all keys new) = a deltacommit of base files —
    // must replay incrementally, not be silently skipped
    t.upsert(orders.limit(10).withColumn("o_orderkey", col("o_orderkey") + 7000000L))
    val r = SyncEngine.sync(SyncEngine.hudiSource(t), SyncEngine.icebergTarget(spark, target))
    assert(r.mode == "incremental" && r.filesAdded > 0)
    assert(graft.iceberg.IcebergTable.forPath(spark, target).toDF().count() ==
      orders.count() + 10)
    // a log-writing deltacommit cannot be expressed — sync must error,
    // never desynchronize
    t.upsert(orders.limit(5).withColumn("o_orderstatus", lit("Z")))
    intercept[Exception] {
      SyncEngine.sync(SyncEngine.hudiSource(t), SyncEngine.icebergTarget(spark, target))
    }
  }

  test("read-optimized sync opt-in: base files flow, log mutations stay invisible") {
    import graft.sync.SyncEngine
    val dir = tmpDir("mor_ro")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val target = s"$dir/ice"
    SyncEngine.sync(SyncEngine.hudiSource(t, readOptimized = true),
      SyncEngine.icebergTarget(spark, target))
    // mixed deltacommit: updates (log blocks) + inserts (base files)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 99.0)
      .unionByName(orders.limit(10).withColumn("o_orderkey", col("o_orderkey") + 9000000L)))
    // the DEFAULT source still refuses the log-bearing table, and the
    // refusal names the opt-in
    val e = intercept[Exception] {
      SyncEngine.sync(SyncEngine.hudiSource(t), SyncEngine.icebergTarget(spark, s"$dir/ice2"))
    }
    assert(e.getMessage.contains("readOptimized = true"), e.getMessage)
    val r = SyncEngine.sync(SyncEngine.hudiSource(t, readOptimized = true),
      SyncEngine.icebergTarget(spark, target))
    assert(r.mode == "incremental" && r.filesAdded > 0)
    val got = graft.iceberg.IcebergTable.forPath(spark, target).toDF()
    // target == the table's own read-optimized view: inserts visible at
    // original prices, the +99.0 updates invisible
    assert(got.count() == orders.count() + 10)
    assert(got.filter(col("o_totalprice") =!= col("o_totalprice").cast("long") + 0.0).count()
      == got.filter(col("o_totalprice") =!= col("o_totalprice").cast("long") + 0.0).count())
    val roView = t.readOptimizedDF()
    assert(got.select("o_orderkey", "o_totalprice").exceptAll(
      roView.select("o_orderkey", "o_totalprice")).count() == 0)
    assert(roView.select("o_orderkey", "o_totalprice").exceptAll(
      got.select("o_orderkey", "o_totalprice")).count() == 0)
    // once compacted, the SAME feed replays the compaction and the
    // target re-converges with the full snapshot — no watermark reset
    assert(t.compactMor().nonEmpty)
    val r2 = SyncEngine.sync(SyncEngine.hudiSource(t, readOptimized = true),
      SyncEngine.icebergTarget(spark, target))
    assert(r2.mode == "incremental")
    val conv = graft.iceberg.IcebergTable.forPath(spark, target).toDF()
    assert(conv.select("o_orderkey", "o_totalprice").exceptAll(
      t.toDF().select("o_orderkey", "o_totalprice")).count() == 0)
    assert(conv.count() == t.toDF().count())
  }

  test("changeFeed streams log records as upserts/deletes and base adds as inserts") {
    val dir = tmpDir("mor_cdf")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val v0 = t.latestInstant
    val all = keys(t)
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0).withColumn("o_orderstatus", lit("C"))
      .unionByName(orders.limit(5).withColumn("o_orderkey", col("o_orderkey") + 8000000L)))
    import spark.implicits._
    t.deleteKeys(all.filter(_ % 11 == 0).toDF("o_orderkey"))
    val feed = t.changeFeed(v0, t.latestInstant)
    val ups = feed.filter(col("_change_type") === "upsert")
    assert(ups.count() == all.count(_ % 4 == 0))
    assert(ups.filter(col("o_orderstatus") =!= "C").count() == 0)
    assert(feed.filter(col("_change_type") === "insert").count() == 5)
    val dels = feed.filter(col("_change_type") === "delete")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(dels == all.filter(_ % 11 == 0))
  }

  test("rollback of a deltacommit deletes its log files and restores the snapshot") {
    val dir = tmpDir("mor_rollback")
    val t = HudiTable.createMor(spark, s"$dir/t", orders, "o_orderkey")
    val before = t.toDF().orderBy("o_orderkey").collect().toSeq
    t.upsert(orders.filter(col("o_orderkey") % 6 === 0)
      .withColumn("o_orderstatus", lit("R")))
    assert(t.hasLogFiles())
    t.rollback()
    assert(!t.hasLogFiles())
    assert(t.toDF().orderBy("o_orderkey").collect().toSeq == before)
    assert(t.toDF().filter(col("o_orderstatus") === "R").count() == 0)
  }

  test("COW tables are unaffected: no record key, commit action, no logs") {
    val dir = tmpDir("mor_cow")
    val t = HudiTable.create(spark, s"$dir/t", orders)
    assert(!t.isMor)
    assert(t.recordKeyField.isEmpty)
    intercept[IllegalArgumentException](t.upsert(orders.limit(1)))
  }

  test("changeFeed over instants that added no files is empty, not a crash") {
    val dir = tmpDir("mor_cdf_empty")
    val t = HudiTable.create(spark, s"$dir/t", orders.limit(20))
    val v0 = t.latestInstant
    t.overwrite(orders.limit(0)) // 0-row base files are dropped: no adds
    val feed = t.changeFeed(v0, t.latestInstant)
    assert(feed.count() == 0)
    assert(feed.columns.contains("_change_type"))
    assert(feed.columns.contains("_commit_instant"))
  }
}
