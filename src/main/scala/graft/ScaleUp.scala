package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side scaling-data generator (never run by the driver): writes
  * a K×-replicated copy of a testdata dir so per-core scaling of the
  * hottest queries can be measured at a SF the fixture set doesn't ship
  * (r16 verdict item 8: sf0.1 is fixed-overhead-bound, so parallelism
  * claims need a larger-SF data point). Fact-table keys are shifted per
  * copy by a multiple of every modulus the operators split on (4, 5,
  * 20), so each copy carries the same batch/candidate structure and FK
  * joins stay intact; dimensions (customer/part/supplier/nation/region)
  * keep 1× like a real scale factor. Timing-only data — the oracle
  * never sees it.
  *
  * Usage: sbt "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf0.5 5"
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = args(2).toInt
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val off = 100000000L // multiple of 4, 5, 20; far above any fixture key

    def rep(df: DataFrame, shift: Map[String, Int => org.apache.spark.sql.Column]): DataFrame =
      (0 until k).map { i =>
        shift.foldLeft(df) { case (d, (c, f)) => d.withColumn(c, f(i)) }
      }.reduce(_ unionAll _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$k")
    }

    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")

    write("documents", rep(t("documents"),
      Map("doc_id" -> (i => col("doc_id") + lit(i * off)))))
    write("embeddings", rep(t("embeddings"),
      Map("vec_id" -> (i => col("vec_id") + lit(i * off)))))
    write("events", rep(t("events"),
      Map("event_id" -> (i => col("event_id") + lit(i * off)))))
    write("orders", rep(t("orders"),
      Map("o_orderkey" -> (i => col("o_orderkey") + lit(i * off)))))
    write("lineitem", rep(t("lineitem"),
      Map("l_orderkey" -> (i => col("l_orderkey") + lit(i * off)))))
    Seq("customer", "part", "supplier", "nation", "region").foreach { d =>
      t(d).write.mode("overwrite").parquet(s"$dst/$d.parquet")
      println(s"[scaleup] $d x1 (dimension)")
    }
    spark.stop()
  }
}
