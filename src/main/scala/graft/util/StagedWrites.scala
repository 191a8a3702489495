package graft.util

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * Physical parquet writes for table-format commit protocols: stage into
 * a per-write hidden directory under the table root, then move the
 * produced files into the final layout (hive-style partition dirs
 * preserved). The returned paths are exactly and only the files THIS
 * write produced — the property concurrent writers need so a commit
 * never claims another writer's in-flight files. Spark part-file names
 * embed the job UUID, so placement cannot collide.
 */
object StagedWrites {

  /** Returns fully-qualified final paths of the files written. */
  def writeAndPlace(
      df: DataFrame,
      tableRoot: String,
      partitionColumns: Seq[String]): Seq[String] = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tableRoot)
    val fs = root.getFileSystem(hconf)
    val staging = new Path(tableRoot, s".staging-${UUID.randomUUID()}")
    val writer = df.write.mode("append")
    (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*) else writer)
      .parquet(staging.toString)
    val stagingBase = staging.toUri.getPath.stripSuffix("/") + "/"
    def walk(dir: Path): Seq[Path] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val placed = walk(staging).map { f =>
      val rel = f.toUri.getPath.stripPrefix(stagingBase)
      val dest = new Path(root, rel)
      fs.mkdirs(dest.getParent)
      require(fs.rename(f, dest), s"failed to place $rel into $tableRoot")
      dest.toString
    }
    fs.delete(staging, true)
    placed
  }
}
