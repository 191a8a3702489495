package graft.hudi

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Pluggable lock guarding a Hudi sync commit's validate→publish window
 * — the analog of real Hudi's `hoodie.write.lock.provider` writer
 * config. Two Hudi sync commits write DIFFERENT instant filenames, so
 * (unlike the Delta/Iceberg targets) no version-slot put-if-absent can
 * arbitrate the watermark-CAS check against the publish: the check and
 * the publish must run under one mutual exclusion scope.
 *
 * Scope options mirror Hudi's own provider matrix (ref
 * `hudi-sync` lock-provider configs; InProcessLockProvider /
 * FileSystemBasedLockProvider):
 *  - [[HudiLockProvider.InProcess]] — a per-table JVM monitor. Closes
 *    the window between threads of ONE scheduler process only.
 *  - [[HudiLockProvider.FileLock]] — an exclusive OS file lock on
 *    `<table>/.hoodie/.graft_sync.lock`, nested inside the in-process
 *    monitor (JVM file locks are process-scoped). Closes the window
 *    across PROCESSES sharing a POSIX filesystem — the local/NFS
 *    deployment shape. Object stores need an external service lock
 *    (DynamoDB/ZooKeeper in real Hudi), out of scope offline; the
 *    trait is the seam one plugs those into.
 */
trait HudiLockProvider {
  def withLock[A](tablePath: String)(body: => A): A
}

object HudiLockProvider {

  /** Per-table monitor making validate→publish atomic within one JVM
    * (real Hudi's InProcessLockProvider). */
  object InProcess extends HudiLockProvider {
    def withLock[A](tablePath: String)(body: => A): A =
      HudiTable.syncLock(tablePath).synchronized(body)
  }

  /** Exclusive file lock under the table's `.hoodie/` dir, blocking
    * until acquired. Always nests inside the in-process monitor: a JVM
    * holds a FileLock per PROCESS, so two threads of one JVM must
    * serialize on the monitor first (an un-nested second `lock()` call
    * would throw OverlappingFileLockException, not block). */
  object FileLock extends HudiLockProvider {
    def withLock[A](tablePath: String)(body: => A): A =
      HudiTable.syncLock(tablePath).synchronized {
        val dir = Paths.get(localPathOf(tablePath), ".hoodie")
        Files.createDirectories(dir)
        val ch = FileChannel.open(dir.resolve(".graft_sync.lock"),
          StandardOpenOption.CREATE, StandardOpenOption.WRITE)
        try {
          val lock = ch.lock() // blocks until the other process releases
          try body finally lock.release()
        } finally ch.close()
      }
  }

  /** `file:`-scheme-tolerant local path of a table location. */
  private def localPathOf(tablePath: String): String = {
    val uri = new org.apache.hadoop.fs.Path(tablePath).toUri
    if (uri.getScheme == null || uri.getScheme == "file") uri.getPath else tablePath
  }

  /** Resolve the provider for a sync target. `spark.graft.hudi.syncLockProvider`:
    *  - `auto` (default): file lock when the table lives on a local
    *    POSIX filesystem (cross-process safe out of the box), in-process
    *    monitor otherwise;
    *  - `filelock` / `inprocess`: forced. */
  def forTable(spark: org.apache.spark.sql.SparkSession, tablePath: String): HudiLockProvider = {
    val mode = spark.conf.getOption("spark.graft.hudi.syncLockProvider").getOrElse("auto")
    val scheme = new org.apache.hadoop.fs.Path(tablePath).toUri.getScheme
    mode match {
      case "filelock" => FileLock
      case "inprocess" => InProcess
      case _ => if (scheme == null || scheme == "file") FileLock else InProcess
    }
  }
}
