package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/**
 * Freezes the deterministic-but-not-SQL-expressible query outputs
 * (SimHash and hyperplane-LSH use engine-native hash expressions DuckDB
 * cannot replay) as committed parquet expectations under `expected/`.
 * The matching oracle SQL selects the frozen file whose `src_key`
 * (Σ n_chars of the source `documents` table — an exact integer both
 * engines compute identically) matches the dataset under test, so one
 * oracle string serves every scale factor.
 *
 * Usage: `runMain graft.FreezeExpected <sfDir> [expectedDir] [names]`
 * (`names` = comma-separated subset; default all). Re-run per sfDir
 * whenever a frozen pipeline or its constants change, and commit the
 * refreshed files.
 */
object FreezeExpected {

  val Frozen: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "d03_simhash_dedup" -> (Dedup.simhashPairs _),
      "d05_embedding_near_dup" -> (Dedup.embeddingNearDupPairs _),
      "m02b_feature_bins" -> (Multimodal.featureBins _),
      "m05_phash_near_dup" -> ((s, d) => Multimodal.phashNearDup(s, d)))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args.lift(1).getOrElse("expected")
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val key = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(sum(col("n_chars"))).head.getLong(0)
    val conf = spark.sparkContext.hadoopConfiguration
    Frozen.filter(f => only.forall(_.contains(f._1))).foreach { case (name, fn) =>
      val tmp = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_freeze_$name"
      fn(spark, sfDir).withColumn("src_key", lit(key))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val fs = new Path(tmp).getFileSystem(conf)
      val part = fs.globStatus(new Path(s"$tmp/part-*.parquet")).head.getPath
      val dest = new Path(s"$outDir/${name}_$key.parquet")
      fs.mkdirs(dest.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dest, false, true, conf)
      println(s"froze $name -> $dest")
    }
    spark.stop()
  }
}
