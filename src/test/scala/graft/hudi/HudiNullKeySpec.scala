package graft.hudi

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Null-record-key refusal on keyed Hudi tables. Real Hudi throws
 * `HoodieKeyException` from key generation when a record key is null;
 * without that fence the engine's upsert routing join (plain key
 * equality) inserts a duplicate instead of updating, and the merged
 * read's `Window.partitionBy(key)` collapses distinct null-key rows
 * into one. Every write entry point — createMor, append, upsert,
 * deleteKeys — must refuse a null-key frame with a named error, and
 * un-keyed tables must keep accepting nulls in ordinary columns.
 */
class HudiNullKeySpec extends SparkTestBase {
  import spark.implicits._

  private def rows(ks: Seq[java.lang.Long]) =
    ks.zipWithIndex.map { case (k, i) => (k, s"v$i") }.toDF("k", "v")

  /** The named refusal must surface through Spark's executor-exception
    * wrapping — walk the cause chain for our message. */
  private def assertRefused(body: => Any): Unit = {
    val e = intercept[Throwable](body)
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("null record key"), s"wrong error: $msgs")
  }

  test("createMor refuses a frame with a null record key") {
    val dir = tmpDir("nullkey_create")
    assertRefused(
      HudiTable.createMor(spark, s"$dir/t", rows(Seq(1L, null, 3L)), "k"))
  }

  test("append to a keyed table refuses null keys") {
    val dir = tmpDir("nullkey_append")
    val t = HudiTable.createMor(spark, s"$dir/t", rows(Seq(1L, 2L)), "k")
    assertRefused(t.append(rows(Seq(3L, null))))
    // the failed write never became a commit
    assert(t.toDF().count() == 2)
  }

  test("upsert refuses null keys before any file is routed") {
    val dir = tmpDir("nullkey_upsert")
    val t = HudiTable.createMor(spark, s"$dir/t", rows(Seq(1L, 2L)), "k")
    assertRefused(t.upsert(rows(Seq(1L, null))))
    assert(t.toDF().count() == 2)
  }

  test("deleteKeys refuses null keys") {
    val dir = tmpDir("nullkey_delete")
    val t = HudiTable.createMor(spark, s"$dir/t", rows(Seq(1L, 2L)), "k")
    assertRefused(t.deleteKeys(Seq[java.lang.Long](null).toDF("k")))
    assert(t.toDF().count() == 2)
  }

  test("valid keyed writes still pass through the fence") {
    val dir = tmpDir("nullkey_ok")
    val t = HudiTable.createMor(spark, s"$dir/t", rows(Seq(1L, 2L)), "k")
    t.upsert(Seq((1L, "updated")).toDF("k", "v"))
    val got = t.toDF().orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "updated"), (2L, "v1")))
  }

  test("un-keyed COW tables keep accepting null values in any column") {
    val dir = tmpDir("nullkey_cow")
    val df = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "v")
    val t = HudiTable.create(spark, s"$dir/t", df)
    assert(t.toDF().count() == 2)
    assert(t.toDF().filter(col("k").isNull).count() == 1)
  }
}
