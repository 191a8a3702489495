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

  /** Returns fully-qualified final paths of the files written.
    *
    * `hiveStylePartitionPaths = false` places files under slash-delimited
    * partition VALUES (`2023-10/part-...parquet`) instead of hive `k=v`
    * dirs — Hudi's DIR_HIERARCHY_PARTITION_VALUES layout (ref
    * `api/.../storage/DataLayoutStrategy.java:29-33`). Spark always
    * stages hive-style; placement strips the `key=` prefix, so the
    * escaped value spelling is identical in both layouts. */
  def writeAndPlace(
      df: DataFrame,
      tableRoot: String,
      partitionColumns: Seq[String],
      hiveStylePartitionPaths: Boolean = true): Seq[String] = {
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
      val relHive = f.toUri.getPath.stripPrefix(stagingBase)
      val rel =
        if (hiveStylePartitionPaths) relHive
        else relHive.split("/").map { seg =>
          seg.split("=", 2) match {
            case Array(k, v) if partitionColumns.contains(k) => v
            case _ => seg
          }
        }.mkString("/")
      val dest = new Path(root, rel)
      fs.mkdirs(dest.getParent)
      require(fs.rename(f, dest), s"failed to place $rel into $tableRoot")
      dest.toString
    }
    fs.delete(staging, true)
    placed
  }
}
