package graft

import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.functions._

import graft.delta.DeltaTable
import graft.iceberg.IcebergTable

/**
 * Optimistic-concurrency commits: N writers race appends at the same
 * table; the put-if-absent log arbitration plus the per-attempt rebase
 * loop must land every commit exactly once, at contiguous versions,
 * with no rows lost. The barrier maximizes the chance every writer
 * reads the same "latest" before committing, so retries genuinely
 * exercise the rebase path.
 */
class ConcurrencySpec extends SparkTestBase {

  private val writers = 6

  private def race(body: Int => Unit): Unit = {
    val barrier = new CyclicBarrier(writers)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { i =>
      new Thread(() => {
        try { barrier.await(); body(i) }
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing writer failed: ${Option(errs.peek()).map(_.toString)}")
  }

  test("delta: concurrent appends all land, versions contiguous, no rows lost") {
    val dir = tmpDir("delta-race")
    val base = spark.range(0, 10).select(col("id"), lit("seed").as("tag"))
    val t = DeltaTable.create(spark, dir, base)
    race { i =>
      val df = spark.range(100L * i, 100L * i + 10)
        .select(col("id"), lit(s"w$i").as("tag"))
      DeltaTable.forPath(spark, dir).append(df, Seq.empty)
    }
    val got = t.toDF()
    assert(got.count() == 10 + writers * 10)
    assert(got.select("tag").distinct().count() == writers + 1)
    // versions 0..writers with no gaps (every writer committed once)
    val versions = (0L to writers.toLong).map(v => t.toDF(Some(v)).count())
    assert(versions == (1 to writers + 1).map(_ * 10L))
  }

  test("iceberg: concurrent appends all land with no rows lost") {
    val dir = tmpDir("iceberg-race")
    val base = spark.range(0, 10).select(col("id"), lit("seed").as("tag"))
    val t = IcebergTable.create(spark, dir, base)
    race { i =>
      val df = spark.range(100L * i, 100L * i + 10)
        .select(col("id"), lit(s"w$i").as("tag"))
      IcebergTable.forPath(spark, dir).append(df)
    }
    val got = t.toDF()
    assert(got.count() == 10 + writers * 10)
    assert(got.select("tag").distinct().count() == writers + 1)
    assert(t.currentMetadata.snapshots.size == writers + 1)
  }

  test("hudi: concurrent appends all land via instant rebase, no rows lost") {
    val dir = tmpDir("hudi-race")
    val base = spark.range(0, 10).select(col("id"), lit("seed").as("tag"))
    val t = graft.hudi.HudiTable.create(spark, dir, base)
    race { i =>
      val df = spark.range(100L * i, 100L * i + 10)
        .select(col("id"), lit(s"w$i").as("tag"))
      graft.hudi.HudiTable.forPath(spark, dir).append(df)
    }
    val got = t.toDF()
    assert(got.count() == 10 + writers * 10)
    assert(got.select("tag").distinct().count() == writers + 1)
    assert(t.instants.size == writers + 1)
  }

  /** The Hudi maintenance plane (savepoint, savepoint delete, archival)
    * uses the same marker/put-if-absent timeline primitives as data
    * commits — racing it against appenders must never leak an FS-level
    * race (FileAlreadyExists on markers, rename collisions); the only
    * legal failure is the explicit "concurrent hudi commit" lost-race
    * abort. */
  test("hudi: maintenance (savepoint + archival) racing appends leaks no marker races") {
    val dir = tmpDir("hudi-maint-race")
    val base = spark.range(0, 10).select(col("id"), lit("seed").as("tag"))
    val t = graft.hudi.HudiTable.create(spark, dir, base)
    // tighten the archival cap so archival actually runs mid-race
    t.timeline.writeProperties(t.properties ++ Map(
      graft.hudi.HudiTable.MaxActiveInstantsProp -> "4",
      graft.hudi.HudiTable.MinActiveInstantsProp -> "2"))
    val appenders = 3
    val rounds = 3
    val barrier = new CyclicBarrier(appenders + 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appendThreads = (0 until appenders).map { i =>
      new Thread(() => {
        try {
          barrier.await()
          (0 until rounds).foreach { r =>
            val df = spark.range(1000L * i + 100L * r, 1000L * i + 100L * r + 10)
              .select(col("id"), lit(s"w${i}_$r").as("tag"))
            graft.hudi.HudiTable.forPath(spark, dir).append(df)
          }
        } catch { case x: Throwable => errs.add(x) }
      })
    }
    val maintenance = new Thread(() => {
      try {
        barrier.await()
        (0 until rounds * 2).foreach { _ =>
          val tt = graft.hudi.HudiTable.forPath(spark, dir)
          try {
            val sp = tt.savepoint()
            tt.deleteSavepoint(sp)
            tt.archiveTimeline()
          } catch {
            // a concurrent data commit winning the savepoint's instant
            // slot is a legal single-shot abort, never an FS leak
            case e: IllegalStateException
                if e.getMessage != null && e.getMessage.contains("concurrent hudi commit") => ()
          }
        }
      } catch { case x: Throwable => errs.add(x) }
    })
    (appendThreads :+ maintenance).foreach(_.start())
    (appendThreads :+ maintenance).foreach(_.join())
    assert(errs.isEmpty, s"maintenance race leaked: ${Option(errs.peek()).map(_.toString)}")
    val got = t.toDF()
    assert(got.count() == 10 + appenders * rounds * 10)
    assert(got.select("tag").distinct().count() == appenders * rounds + 1)
  }

  /** Race a bin-packing compaction against a row-level delete. Outcome
    * may be either order, or a compaction abort on the conflict check —
    * but the delete must NEVER be resurrected by the rewrite. */
  private def compactDeleteRace(doCompact: () => Unit, doDelete: () => Unit): Unit = {
    val barrier = new CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val a = new Thread(() => {
      try { barrier.await(); doCompact() }
      catch {
        case e: IllegalArgumentException if e.getMessage.contains("conflict") => () // legal abort
        case t: Throwable => errs.add(t)
      }
    })
    val b = new Thread(() => {
      barrier.await()
      var done = false
      var tries = 0
      while (!done) { // single-shot optimistic delete may lose the log race; retry
        try { doDelete(); done = true }
        catch {
          case e: Exception
              if e.getMessage != null && e.getMessage.contains("concurrent commit")
                && tries < 20 =>
            tries += 1; Thread.sleep(10)
          case t: Throwable => errs.add(t); done = true
        }
      }
    })
    a.start(); b.start(); a.join(); b.join()
    assert(errs.isEmpty, s"racer failed: ${Option(errs.peek()).map(_.toString)}")
  }

  test("delta: compaction racing a row-level delete never resurrects deleted rows") {
    val dir = tmpDir("delta-compact-race")
    val t = DeltaTable.create(spark, dir,
      spark.range(0, 1000).select(col("id"), lit("x").as("tag")).repartition(4))
    compactDeleteRace(
      () => { DeltaTable.forPath(spark, dir).compact(smallFileBytes = 1L << 30); () },
      () => { DeltaTable.forPath(spark, dir).delete(col("id") < 100); () })
    val got = t.toDF()
    assert(got.filter(col("id") < 100).count() == 0, "compaction resurrected deleted rows")
    assert(got.count() == 900)
  }

  test("iceberg: compaction racing a row-level delete never resurrects deleted rows") {
    val dir = tmpDir("iceberg-compact-race")
    val t = IcebergTable.create(spark, dir,
      spark.range(0, 1000).select(col("id"), lit("x").as("tag")).repartition(4))
    compactDeleteRace(
      () => { IcebergTable.forPath(spark, dir).compact(smallFileBytes = 1L << 30); () },
      () => { IcebergTable.forPath(spark, dir).deleteWhere(col("id") < 100); () })
    val got = t.toDF()
    assert(got.filter(col("id") < 100).count() == 0, "compaction resurrected deleted rows")
    assert(got.count() == 900)
  }
}
