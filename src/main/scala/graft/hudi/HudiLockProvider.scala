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
    * would throw OverlappingFileLockException, not block). REFUSES
    * non-local table paths loudly: an OS file lock created under some
    * unrelated local path would grant no exclusion for the actual
    * table — silently. Object-store tables need [[Auto]] (in-process
    * scope) or an external service lock plugged into the trait. */
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

  /** Scheme-dispatching default: file lock for local/`file:` table
    * paths (cross-process safe out of the box), in-process monitor for
    * everything else — never a junk local lock file for an `s3a://`
    * table. The conf-aware resolution (forced modes) is [[forTable]]. */
  object Auto extends HudiLockProvider {
    def withLock[A](tablePath: String)(body: => A): A = {
      val scheme = new org.apache.hadoop.fs.Path(tablePath).toUri.getScheme
      val p = if (scheme == null || scheme == "file") FileLock else InProcess
      p.withLock(tablePath)(body)
    }
  }

  /** Local filesystem path of a table location; refuses remote schemes
    * (a relative `Paths.get("s3a://…")` would silently lock a bogus
    * CWD-relative file). */
  private def localPathOf(tablePath: String): String = {
    val uri = new org.apache.hadoop.fs.Path(tablePath).toUri
    require(uri.getScheme == null || uri.getScheme == "file",
      s"HudiLockProvider.FileLock only locks local/file-scheme table paths; " +
        s"$tablePath needs an external service lock provider (or Auto's in-process scope)")
    uri.getPath
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
