package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.iceberg.IcebergTable

/** Statistics-driven join planning: the broadcast decision comes from
  * the REGISTERED Puffin/partition statistics, not from a data scan,
  * and flips exactly at the threshold. */
class StatsJoinSpec extends SparkTestBase {

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(walk)
  }

  private def hasBroadcastJoin(df: DataFrame): Boolean = {
    df.count() // execute so AQE finalizes the physical plan
    walk(df.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
  }

  test("planned join broadcasts iff the registered stats sit under the threshold") {
    val dir = tmpDir("stats_join")
    val dimData = spark.range(0, 2000).select(
      col("id").as("k"), (col("id") % 5).cast("string").as("grp"))
    val factData = spark.range(0, 20000).select(
      (col("id") % 2000).as("fk"), (col("id") * 2).as("v"))
    val dim = IcebergTable.create(spark, s"$dir/dim", dimData)
    dim.writeStatistics(Seq("k"))
    val fact = factData

    // hold Spark's own size-based broadcast out of the picture: the
    // choice under test is the STATS-driven hint, nothing else
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // ndv(k) ≈ 2000 — under a 1e7 threshold the planner must broadcast
      val planned = StatsJoin.joinPlanned(
        fact, dim, "k", col("fk") === col("k"))
      assert(hasBroadcastJoin(planned), "stats under threshold must broadcast")
      // same stats, threshold BELOW the estimate: no broadcast hint
      val shuffled = StatsJoin.joinPlanned(
        fact, dim, "k", col("fk") === col("k"), broadcastRowThreshold = 100)
      assert(!hasBroadcastJoin(shuffled), "stats over threshold must not broadcast")
      // results identical either way (the strategy is physical only)
      assert(planned.count() == 20000 && shuffled.count() == 20000)
      // a dim with NO registered statistics never broadcasts on a guess
      val bare = IcebergTable.create(spark, s"$dir/bare", dimData)
      val noStats = StatsJoin.joinPlanned(
        fact, bare, "k", col("fk") === col("k"))
      assert(!hasBroadcastJoin(noStats), "no stats must mean no broadcast hint")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("plannedRows prefers exact partition-stats counts over the key ndv") {
    val dir = tmpDir("stats_rows")
    val data = spark.range(0, 1000).select(
      col("id").as("k"), (col("id") % 4).cast("string").as("p"))
    val t = IcebergTable.create(spark, s"$dir/t", data, Seq("p"))
    assert(StatsJoin.plannedRows(t, "k").isEmpty, "no stats -> no estimate")
    t.writeStatistics(Seq("k"))
    val ndvOnly = StatsJoin.plannedRows(t, "k").get
    assert(math.abs(ndvOnly - 1000.0) / 1000.0 < 0.15, s"$ndvOnly")
    t.writePartitionStatistics()
    // with partition stats present the estimate is >= the EXACT count
    // (max of the two facts — the safe broadcast posture)
    val both = StatsJoin.plannedRows(t, "k").get
    assert(both >= 1000.0 && both <= math.max(1000.0, ndvOnly), s"$both")
  }
}
