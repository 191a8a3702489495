package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Builder-side measurement harness (never run by the driver): runs the
  * named queries once each after the same fixture/index priming the
  * bench does, with a job-level listener that prints every Spark job's
  * wall clock and description — the per-operator breakdown the guide's
  * §1 "measure first" loop needs when a query is a PIPELINE of jobs
  * (t14's commit sequence, d06's convergence rounds, streaming batch
  * machinery) rather than one plan.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Probe t14_dedup_merge_pipeline ..."
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.range(1000).count()
    graft.operators.FormatQueries.fixtureDir(spark, sfDir)
    graft.operators.IcebergQueries.fixtureDir(spark, sfDir)
    graft.operators.HudiQueries.fixtureDir(spark, sfDir)
    graft.operators.SyncQueries.fixtureDir(spark, sfDir)
    graft.operators.Dedup.primeCorpusSize(spark, sfDir)
    graft.operators.Dedup.primeBucketIndex(spark, sfDir)
    graft.operators.Similarity.primeKmeans(spark, sfDir)
    graft.operators.Similarity.primeCellStore(spark, sfDir)
    graft.operators.Similarity.primeMaintStore(spark, sfDir)
    graft.operators.StreamQueries.primeFixtures(spark, sfDir)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc, js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc, nStages) =>
          val ms = (System.nanoTime() - t0) / 1e6
          println(f"[job] id=${je.jobId}%4d ${ms}%9.1f ms stages=$nStages%2d  $desc")
        }
      }
    }
    val all = SparkEntry.queries
    args.filter(all.contains).foreach { name =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      println(s"=== $name ===")
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      all(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain before detaching
      spark.sparkContext.removeSparkListener(listener)
      println(f"=== $name total ${sec}%.3f s ===")
    }
    spark.stop()
  }
}
