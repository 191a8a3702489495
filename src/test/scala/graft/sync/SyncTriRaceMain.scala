package graft.sync

/**
 * Forked-JVM scheduler for the STOCHASTIC tri-format cross-process sync
 * race (the cross-process twin of SyncCasSpec's 4-thread test): each
 * process appends to a SHARED Delta source (the native writer's
 * version-slot rebase loop arbitrates cross-process appends) and then
 * syncs the source into SHARED Delta, Iceberg AND Hudi targets. The
 * Hudi target is the load-bearing case: its validate→publish window has
 * no version slot and is closed cross-process by the file-lock
 * provider ([[graft.hudi.HudiLockProvider.FileLock]], the local-FS
 * default). All arbitration is on-disk; no choreography.
 */
object SyncTriRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(srcPath, tgtRoot, tag, roundsStr) = args
    val spark = graft.GraftSession.local(2)
    try {
      import spark.implicits._
      val rounds = roundsStr.toInt
      val fmts = Seq("delta", "iceberg", "hudi")
      // a real scheduler backs off and re-runs a sync round that lost
      // its bounded internal retries to sustained contention — the
      // classifier is the TYPE, never message text
      def syncRetry(label: String)(f: => Unit): Unit = {
        var n = 0
        var done = false
        while (!done) {
          try { f; done = true } catch {
            case _: graft.model.ConcurrentSyncException if n < 30 =>
              n += 1
              Thread.sleep(25L * n)
          }
        }
        if (n > 0) println(s"RACE-RETRIES $tag $label $n") // scalastyle:ignore
      }
      (0 until rounds).foreach { i =>
        graft.delta.DeltaTable.forPath(spark, srcPath)
          .append(Seq((s"$tag-$i", i.toLong)).toDF("k", "v"), Seq.empty)
        def source = SyncEngine.deltaSource(graft.delta.DeltaTable.forPath(spark, srcPath))
        fmts.foreach { f =>
          syncRetry(s"$f-$i") {
            SyncEngine.sync(source, SyncEngine.targetFor(spark, f, s"$tgtRoot/tgt_$f"))
          }
        }
      }
      println(s"RACE-DONE $tag") // scalastyle:ignore
    } finally spark.stop()
  }
}
