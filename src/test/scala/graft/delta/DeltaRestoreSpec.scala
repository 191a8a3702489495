package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** RESTORE TABLE ... VERSION AS OF: file-set flip-back in one commit,
  * DV unwinding, metadata restore, history preservation, and the
  * vacuum-horizon failure mode. */
class DeltaRestoreSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def keys(t: DeltaTable): Seq[Long] =
    t.toDF().select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq

  test("restore unwinds a row-level delete; history still shows the deleted state") {
    val dir = tmpDir("restore_dv")
    val t = DeltaTable.create(spark, s"$dir/t", orders.repartition(3))
    val all = keys(t)
    val vDel = t.delete(col("o_orderkey") % 3 === 0)
    assert(keys(t) == all.filterNot(_ % 3 == 0))
    val vRestore = t.restoreTo(vDel - 1)
    assert(vRestore == vDel + 1)
    assert(keys(t) == all)
    // the restore did not rewrite history: the deleted state is still
    // addressable, and the pre-delete state too
    assert(t.toDF(versionAsOf = Some(vDel)).count() == all.count(_ % 3 != 0))
    assert(t.toDF(versionAsOf = Some(vDel - 1)).count() == all.size)
  }

  test("restore past an overwrite re-adds the original files") {
    val dir = tmpDir("restore_ow")
    val t = DeltaTable.create(spark, s"$dir/t", orders.filter(col("o_orderkey") % 2 === 0))
    val evens = keys(t)
    t.overwrite(orders.filter(col("o_orderkey") % 2 === 1), Seq.empty)
    assert(keys(t).forall(_ % 2 == 1))
    t.restoreTo(0L)
    assert(keys(t) == evens)
  }

  test("restore to a version with a different schema restores the metadata") {
    val dir = tmpDir("restore_schema")
    val t = DeltaTable.create(spark, s"$dir/t",
      orders.select("o_orderkey", "o_totalprice").limit(100))
    t.append(orders.limit(50)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_flag", lit("x"))
      .select("o_orderkey", "o_totalprice", "o_flag"), Seq.empty)
    assert(t.toDF().columns.contains("o_flag"))
    t.restoreTo(0L)
    assert(t.toDF().columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    assert(t.toDF().count() == 100)
  }

  test("restore refuses when a needed file was vacuumed") {
    val dir = tmpDir("restore_vac")
    val t = DeltaTable.create(spark, s"$dir/t", orders.filter(col("o_orderkey") % 2 === 0))
    t.overwrite(orders.filter(col("o_orderkey") % 2 === 1), Seq.empty)
    t.vacuum(retentionMs = 0L) // v0's files are no longer live → deleted
    val e = intercept[IllegalArgumentException](t.restoreTo(0L))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("restore across a metadata-ONLY change (rename) rolls the schema back") {
    // fuzz seed 127: RENAME COLUMN moves no files, so the old file-set
    // early return skipped the restore entirely — the adapter thought
    // the rename was unwound while the table kept the new name, and the
    // next keyed write refused ("frame must carry every table column")
    val dir = tmpDir("restore_rename")
    val t = DeltaTable.create(spark, s"$dir/t", orders.limit(100))
    t.enableColumnMapping()
    val vPreRename = t.latestVersion
    t.renameColumn("o_totalprice", "price2")
    assert(t.toDF().columns.contains("price2"))
    val vRestore = t.restoreTo(vPreRename)
    assert(vRestore > vPreRename, "metadata-only restore must COMMIT, not no-op")
    assert(t.toDF().columns.toSeq.contains("o_totalprice"),
      s"restore must roll the rename back; columns = ${t.toDF().columns.mkString(",")}")
    assert(t.toDF().count() == 100)
    // writes under the restored names work again
    t.append(orders.limit(5).withColumn("o_orderkey", col("o_orderkey") + 20000000L), Seq.empty)
    assert(t.toDF().count() == 105)
    // and the renamed state stays time-travelable
    assert(t.toDF(versionAsOf = Some(vPreRename + 1)).columns.contains("price2"))
  }

  test("restore to the current version or an identical state is a no-op") {
    val dir = tmpDir("restore_noop")
    val t = DeltaTable.create(spark, s"$dir/t", orders.limit(100))
    val v0 = t.latestVersion
    assert(t.restoreTo(v0) == v0)
    assert(t.latestVersion == v0)
  }
}
