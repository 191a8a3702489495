package graft.sync

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable

/**
 * Cross-PROCESS sync race: two forked JVMs run the same pipeline —
 * append to a shared Hudi source, sync it into a shared Delta target
 * and a shared Iceberg target — concurrently. SyncCasSpec pins the
 * exact planning→commit interleaving deterministically; this spec runs
 * the stochastic version where every window (target creation, full
 * sync, incremental replay, watermark advance) is raced for real.
 * Convergence is the invariant: after both schedulers finish and one
 * quiescent catch-up sync, both targets hold exactly the source's rows,
 * every live file appears exactly once (duplicate adds would
 * double-count rows on the Iceberg target), and the watermark matches
 * the source head.
 */
class SyncCrossProcessSpec extends SparkTestBase {

  private val RoundsPerProcess = 5

  test("two OS processes syncing one source into shared targets: targets converge, no duplicate files") {
    val dir = tmpDir("sync_xproc")
    val srcPath = s"$dir/src"
    val deltaTgt = s"$dir/tgt_delta"
    val icebergTgt = s"$dir/tgt_iceberg"
    import spark.implicits._
    HudiTable.create(spark, srcPath, Seq(("seed", -1L)).toDF("k", "v"))

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def launch(tag: String): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.sync.SyncRaceMain",
        srcPath, deltaTgt, icebergTgt, tag, RoundsPerProcess.toString)
      new ProcessBuilder(cmd.asJava)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.to(
          new java.io.File(s"$dir/race-$tag.log")))
        .start()
    }
    val p1 = launch("a")
    val p2 = launch("b")
    def await(p: Process, tag: String): Unit = {
      assert(p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
        s"process $tag did not finish")
      val log = scala.io.Source.fromFile(s"$dir/race-$tag.log").mkString
      assert(p.exitValue == 0, s"process $tag failed:\n${log.takeRight(4000)}")
      assert(log.contains(s"RACE-DONE $tag"), s"process $tag incomplete")
    }
    await(p1, "a")
    await(p2, "b")

    // quiescent catch-up: either scheduler may have finished while the
    // other still had appends in flight
    val src = HudiTable.forPath(spark, srcPath)
    val source = SyncEngine.hudiSource(src)
    SyncEngine.sync(source, SyncEngine.targetFor(spark, "delta", deltaTgt))
    SyncEngine.sync(source, SyncEngine.targetFor(spark, "iceberg", icebergTgt))

    val expect = src.toDF().select("k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expect.size == 1 + 2 * RoundsPerProcess)

    for ((fmt, path) <- Seq("delta" -> deltaTgt, "iceberg" -> icebergTgt)) {
      val (df, paths) = fmt match {
        case "delta" =>
          val t = DeltaTable.forPath(spark, path)
          (t.toDF(), t.snapshotDataFiles().map(_.physicalPath))
        case "iceberg" =>
          val t = IcebergTable.forPath(spark, path)
          (t.toDF(), t.snapshotDataFiles().map(_.physicalPath))
      }
      // exactly-once files: a stale-plan commit that slipped through
      // would list a source file twice and double-count its rows
      assert(paths.distinct.size == paths.size,
        s"duplicate live files on $fmt target:\n${paths.sorted.mkString("\n")}")
      val got = df.select("k", "v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect,
        s"$fmt target diverged: missing=${expect -- got} extra=${got -- expect}")
      assert(df.count() == expect.size, s"$fmt target double-counts rows")
      assert(SyncEngine.targetFor(spark, fmt, path).watermarkFor(source.sourceId)
        .contains(source.currentVersion), s"$fmt watermark off the source head")
    }
  }

  test("stochastic: 3 OS processes append+sync one delta source into shared TRI-format targets (hudi under the file lock)") {
    val dir = tmpDir("sync_xproc_tri")
    val srcPath = s"$dir/src"
    import spark.implicits._
    DeltaTable.create(spark, srcPath, Seq(("seed", -1L)).toDF("k", "v"))
    val fmts = Seq("delta", "iceberg", "hudi")
    val procs = 3
    val rounds = 3

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def launch(tag: String): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        // explicit, though `auto` resolves to the file lock on /tmp too:
        // the spec's point is the cross-process Hudi validate→publish
        "-Dspark.graft.hudi.syncLockProvider=filelock",
        "-cp", cp, "graft.sync.SyncTriRaceMain",
        srcPath, dir, tag, rounds.toString)
      new ProcessBuilder(cmd.asJava)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.to(
          new java.io.File(s"$dir/tri-$tag.log")))
        .start()
    }
    val ps = (0 until procs).map(i => s"p$i" -> launch(s"p$i"))
    ps.foreach { case (tag, p) =>
      assert(p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
        s"process $tag did not finish")
      val log = scala.io.Source.fromFile(s"$dir/tri-$tag.log").mkString
      assert(p.exitValue == 0, s"process $tag failed:\n${log.takeRight(4000)}")
      assert(log.contains(s"RACE-DONE $tag"), s"process $tag incomplete")
    }

    // quiescent catch-up, then every target must hold exactly the source
    val src = DeltaTable.forPath(spark, srcPath)
    val source = SyncEngine.deltaSource(src)
    fmts.foreach(f => SyncEngine.sync(source, SyncEngine.targetFor(spark, f, s"$dir/tgt_$f")))

    val expect = src.toDF().select("k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expect.size == 1 + procs * rounds, s"source lost appends: $expect")
    for (fmt <- fmts) {
      val path = s"$dir/tgt_$fmt"
      val (df, paths) = fmt match {
        case "delta" =>
          val t = DeltaTable.forPath(spark, path)
          (t.toDF(), t.snapshotDataFiles().map(_.physicalPath))
        case "iceberg" =>
          val t = IcebergTable.forPath(spark, path)
          (t.toDF(), t.snapshotDataFiles().map(_.physicalPath))
        case "hudi" =>
          val t = HudiTable.forPath(spark, path)
          (t.toDF(), t.snapshotDataFiles().map(_.physicalPath))
      }
      assert(paths.distinct.size == paths.size,
        s"duplicate live files on $fmt target:\n${paths.sorted.mkString("\n")}")
      val got = df.select("k", "v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect,
        s"$fmt target diverged: missing=${expect -- got} extra=${got -- expect}")
      assert(df.count() == expect.size, s"$fmt target double-counts rows")
      assert(SyncEngine.targetFor(spark, fmt, path).watermarkFor(source.sourceId)
        .contains(source.currentVersion), s"$fmt watermark off the source head")
    }
  }
}
