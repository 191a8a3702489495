package graft.sync

/**
 * Forked-JVM sync scheduler for the cross-process sync race test: each
 * process appends to a SHARED Hudi source (cross-process append safety
 * is HudiCrossProcessSpec's proven ground) and then syncs the source
 * into SHARED Delta and Iceberg targets — two schedulers running one
 * pipeline, the reference's own deployment shape. All arbitration is
 * on-disk: the watermark CAS + version-slot put-if-absent inside each
 * target's syncCommit, and SyncEngine.sync's bounded re-plan retry.
 */
object SyncRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(srcPath, deltaTgt, icebergTgt, tag, roundsStr) = args
    val spark = graft.GraftSession.local(2)
    try {
      import spark.implicits._
      val rounds = roundsStr.toInt
      // a real scheduler backs off and re-runs when a sync round loses
      // its bounded internal retries to sustained contention
      def syncRetry(label: String)(f: => Unit): Unit = {
        var n = 0
        var done = false
        while (!done) {
          try { f; done = true } catch {
            // the classifier is the TYPE, never message text
            case _: graft.model.ConcurrentSyncException if n < 10 =>
              n += 1
              Thread.sleep(50L * n)
          }
        }
        if (n > 0) println(s"RACE-RETRIES $tag $label $n") // scalastyle:ignore
      }
      (0 until rounds).foreach { i =>
        graft.hudi.HudiTable.forPath(spark, srcPath)
          .append(Seq((s"$tag-$i", i.toLong)).toDF("k", "v"))
        def source = SyncEngine.hudiSource(graft.hudi.HudiTable.forPath(spark, srcPath))
        syncRetry(s"delta-$i") {
          SyncEngine.sync(source, SyncEngine.targetFor(spark, "delta", deltaTgt))
        }
        syncRetry(s"iceberg-$i") {
          SyncEngine.sync(source, SyncEngine.targetFor(spark, "iceberg", icebergTgt))
        }
      }
      println(s"RACE-DONE $tag") // scalastyle:ignore
    } finally spark.stop()
  }
}
