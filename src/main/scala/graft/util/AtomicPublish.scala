package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Atomic put-if-absent publication of a staged file — the primitive
 * every commit log here arbitrates concurrent writers with.
 *
 * `FileContext.rename(…, Rename.NONE)` is atomic on HDFS-like stores
 * (a single namenode op), but on the local filesystem it is
 * check-then-act: two racing writers can both pass the existence check
 * and the second rename() silently REPLACES the first commit. On
 * `file:` schemes we instead publish via `Files.createLink`, which the
 * kernel guarantees fails with EEXIST atomically; everywhere else the
 * FileContext rename keeps its atomic semantics.
 */
object AtomicPublish {

  /** Returns true iff `tmp`'s content became `target` and no file
    * existed there; `tmp` is always consumed (deleted) on return. */
  def putIfAbsent(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
    val scheme = Option(fs.makeQualified(target).toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          false
      }
    } else {
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, conf)
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          false
      }
    }
  }
}
