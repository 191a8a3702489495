package graft.sync

/**
 * Forked-JVM competitor for the fuzzer's `racesync` op: one sync of
 * `srcFmt@srcPath` into `tgtFmt@tgtPath`, retrying the typed
 * [[graft.model.ConcurrentSyncException]] like any real scheduler —
 * all arbitration is on-disk (version slots; the Hudi file lock), so
 * racing this against the fuzz sequence's own sync exercises the
 * cross-PROCESS validate→publish window mid-sequence, not just in the
 * fixed choreographies of the dedicated race specs.
 */
object FuzzRaceSyncMain {
  def main(args: Array[String]): Unit = {
    val Array(srcFmt, srcPath, tgtFmt, tgtPath) = args
    val spark = graft.GraftSession.local(2)
    try {
      var n = 0
      var done = false
      while (!done) {
        try {
          SyncEngine.sync(
            SyncEngine.sourceFor(spark, srcFmt, srcPath),
            SyncEngine.targetFor(spark, tgtFmt, tgtPath))
          done = true
        } catch {
          case _: graft.model.ConcurrentSyncException if n < 30 =>
            n += 1
            Thread.sleep(25L * n)
        }
      }
      println("RACE-DONE") // scalastyle:ignore
    } finally spark.stop()
  }
}
