package graft.delta

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.stats.{FileFooterStats, ParquetFooterStats}

/**
 * User-facing Delta table API over the native log codec: create/append/
 * overwrite with real data writes, metadata-only conversion of existing
 * parquet (the reference's core "sync without rewriting data" semantics),
 * snapshot reads, `versionAsOf`/`timestampAsOf` time travel (ref IT
 * surface `ITOneTableClient.java:654-699`), incremental change reads, and
 * a scan builder with partition pruning + min/max file skipping driven by
 * the log's own stats — the log-level skipping layer Spark core doesn't
 * provide (SURVEY.md §4).
 */
final class DeltaTable private (spark: SparkSession, val log: DeltaLog) {

  def tablePath: String = log.tablePath

  // ---------------------------------------------------------------- reads

  def latestVersion: Long = log.latestVersion().getOrElse(
    throw new IllegalStateException(s"empty delta table: $tablePath"))

  def schemaAt(asOf: Option[Long] = None): (StructType, Seq[String]) = {
    val (meta, _) = log.metadataAt(asOf)
    (DataType.fromJson(meta.schemaString).asInstanceOf[StructType], meta.partitionColumns)
  }

  /** Resolve timestampAsOf → version: latest commit with ts <= given. */
  def versionForTimestamp(tsMillis: Long): Long = {
    val candidates = log.commitTimestamps().filter(_._2 <= tsMillis)
    require(candidates.nonEmpty, s"no commit at or before timestamp $tsMillis")
    candidates.maxBy(_._2)._1
  }

  def scan: DeltaScanBuilder = new DeltaScanBuilder(spark, this, None)
  def scanAsOf(version: Long): DeltaScanBuilder = new DeltaScanBuilder(spark, this, Some(version))
  def scanAsOfTimestamp(tsMillis: Long): DeltaScanBuilder =
    new DeltaScanBuilder(spark, this, Some(versionForTimestamp(tsMillis)))

  /** Full snapshot read (latest or time-traveled). */
  def toDF(versionAsOf: Option[Long] = None): DataFrame =
    (versionAsOf match {
      case Some(v) => scanAsOf(v)
      case None    => scan
    }).toDF()

  /**
   * Rows added in versions (from, to] — CDF-style incremental read (ref
   * incremental sync §2.9). Returns the data of newly added files.
   */
  def changesAsDF(fromExclusive: Long, toInclusive: Long): DataFrame = {
    val changed = log.changesDF(fromExclusive, toInclusive)
      .filter(col("added"))
      .select("path").collect().map(_.getString(0))
    val (schema, partCols) = schemaAt(Some(toInclusive))
    DeltaTable.readFiles(spark, tablePath, changed.toSeq, schema, partCols)
  }

  // ---------------------------------------------------------------- writes

  /** Append `df`, physically writing parquet under the table root. */
  def append(df: DataFrame, partitionColumns: Seq[String]): Long =
    write(df, partitionColumns, overwrite = false)

  /** Logical overwrite: new files added, previous live files removed in
    * the log; old data files stay on disk so time travel keeps working. */
  def overwrite(df: DataFrame, partitionColumns: Seq[String]): Long =
    write(df, partitionColumns, overwrite = true)

  private def write(df: DataFrame, partitionColumns: Seq[String], overwrite: Boolean): Long = {
    val before = DeltaTable.listDataFiles(spark, tablePath).toSet
    val writer = df.write.mode("append")
    (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*) else writer)
      .parquet(tablePath)
    val after = DeltaTable.listDataFiles(spark, tablePath)
    val newFiles = after.filterNot(before.contains)
    val stats = ParquetFooterStats.collect(spark, newFiles)

    val dataSchema = StructType(df.schema.filterNot(f => partitionColumns.contains(f.name)))
    val adds = stats.map { st =>
      val rel = DeltaTable.relativize(tablePath, st.path)
      AddFile(
        path = rel,
        partitionValues = DeltaTable.partitionValuesFromPath(rel, partitionColumns),
        size = st.fileSizeBytes,
        modificationTime = st.modificationTime,
        dataChange = true,
        stats = Some(DeltaStats.toJson(st, dataSchema)))
    }
    val removes: Seq[DeltaAction] =
      if (overwrite && log.latestVersion().nonEmpty)
        log.snapshotFilesDF().select("path").collect().toSeq
          .map(r => RemoveFile(r.getString(0), System.currentTimeMillis(), dataChange = true))
      else Seq.empty

    val v = log.latestVersion().map(_ + 1).getOrElse(0L)
    val metaActions: Seq[DeltaAction] =
      if (v == 0L)
        Seq(
          Protocol(),
          DeltaMetadata(
            id = UUID.randomUUID().toString,
            schemaString = df.schema.json,
            partitionColumns = partitionColumns,
            configuration = Map("graft.engine" -> "onetablespark"),
            createdTime = System.currentTimeMillis()))
      else {
        val (existing, _) = schemaAt(None)
        val full = StructType(existing.fields)
        if (full.json != df.schema.json)
          Seq(log.metadataAt(None)._1.copy(schemaString = df.schema.json))
        else Seq.empty
      }
    val info = CommitInfo(
      System.currentTimeMillis(),
      if (overwrite) "WRITE" else "APPEND",
      Map("mode" -> (if (overwrite) "Overwrite" else "Append")))
    require(log.commit(v, metaActions ++ removes ++ adds :+ info),
      s"concurrent commit detected at version $v of $tablePath")
    v
  }
}

object DeltaTable {

  def forPath(spark: SparkSession, tablePath: String): DeltaTable =
    new DeltaTable(spark, DeltaLog.forTable(spark, tablePath))

  /** Create (version 0) by physically writing `df`. */
  def create(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      partitionColumns: Seq[String] = Seq.empty): DeltaTable = {
    val t = forPath(spark, tablePath)
    require(t.log.latestVersion().isEmpty, s"table already exists: $tablePath")
    t.append(df, partitionColumns)
    t
  }

  /**
   * Metadata-only conversion of an existing parquet dataset: the add
   * actions point at the source files (absolute paths) — no data is
   * rewritten, exactly the reference's sync contract (ref README.md:1-16:
   * "without rewriting any data files"). Schema from footers via Spark
   * inference; per-file stats from parquet footers.
   */
  def convertFromParquet(
      spark: SparkSession,
      sourceLocation: String,
      tablePath: String): DeltaTable = {
    val t = forPath(spark, tablePath)
    require(t.log.latestVersion().isEmpty, s"table already exists: $tablePath")
    val files = ParquetFooterStats.listParquetFiles(spark, sourceLocation)
    val schema = spark.read.parquet(sourceLocation).schema
    val stats = ParquetFooterStats.collect(spark, files)
    val adds = stats.map { st =>
      AddFile(
        path = new Path(st.path).toUri.toString,
        partitionValues = Map.empty,
        size = st.fileSizeBytes,
        modificationTime = st.modificationTime,
        dataChange = true,
        stats = Some(DeltaStats.toJson(st, schema)))
    }
    val actions: Seq[DeltaAction] = Seq(
      Protocol(),
      DeltaMetadata(
        id = UUID.randomUUID().toString,
        schemaString = schema.json,
        partitionColumns = Seq.empty,
        configuration = Map("graft.converted.from" -> sourceLocation),
        createdTime = System.currentTimeMillis())) ++ adds :+
      CommitInfo(System.currentTimeMillis(), "CONVERT", Map("source" -> sourceLocation))
    require(t.log.commit(0L, actions), s"table already exists: $tablePath")
    t
  }

  // ------------------------------------------------------------- utilities

  private[delta] def listDataFiles(spark: SparkSession, tablePath: String): Seq[String] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    def walk(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) Seq(st.getPath.toUri.getPath)
        else Seq.empty
      }
    walk(p)
  }

  private[delta] def relativize(tablePath: String, absolute: String): String = {
    val base = new Path(tablePath).toUri.getPath.stripSuffix("/") + "/"
    val abs = new Path(absolute).toUri.getPath
    if (abs.startsWith(base)) abs.substring(base.length) else abs
  }

  /** Parse hive-style `k=v` dirs out of a relative path (ref partition
    * path parser `core/.../hudi/HudiPartitionValuesExtractor.java:47-173`). */
  private[delta] def partitionValuesFromPath(
      relPath: String, partitionColumns: Seq[String]): Map[String, String] = {
    if (partitionColumns.isEmpty) return Map.empty
    val dirs = relPath.split("/").dropRight(1)
    dirs.flatMap { d =>
      d.split("=", 2) match {
        case Array(k, v) if partitionColumns.contains(k) =>
          val decoded = java.net.URLDecoder.decode(v, "UTF-8")
          Some(k -> (if (decoded == "__HIVE_DEFAULT_PARTITION__") null else decoded))
        case _ => None
      }
    }.toMap
  }

  /** Read a set of snapshot files as a DataFrame, reattaching partition
    * columns from hive-style paths when the table is partitioned. */
  private[delta] def readFiles(
      spark: SparkSession,
      tablePath: String,
      files: Seq[String],
      schema: StructType,
      partitionColumns: Seq[String]): DataFrame = {
    if (files.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val absolute = files.map { f =>
      if (f.startsWith("/") || f.contains("://")) f
      else new Path(tablePath, f).toString
    }
    if (partitionColumns.nonEmpty)
      spark.read.option("basePath", tablePath).schema(schema).parquet(absolute: _*)
    else {
      val dataSchema = StructType(schema.filterNot(f => partitionColumns.contains(f.name)))
      spark.read.schema(dataSchema).parquet(absolute: _*)
    }
  }
}

/**
 * Scan builder with log-level pruning: partition predicates evaluated on
 * the manifest's `partitionValues`, and min/max skipping evaluated on the
 * per-file stats JSON — both happen BEFORE any parquet footer is opened,
 * which is the property that matters when a snapshot has 10^6 files
 * (SURVEY.md §4 "file skipping / data skipping").
 */
final class DeltaScanBuilder(
    spark: SparkSession,
    table: DeltaTable,
    asOfVersion: Option[Long]) {

  private var partitionPredicates: Seq[(String, Set[String])] = Seq.empty
  private var rangePredicates: Seq[(String, Option[String], Option[String])] = Seq.empty

  /** Keep only files whose partition value for `column` is in `values`. */
  def partitionIn(column: String, values: Set[String]): DeltaScanBuilder = {
    partitionPredicates +:= (column -> values)
    this
  }

  /** Skip files whose [min,max] for `column` can't intersect [lo,hi]
    * (either bound optional). Values compared in the column's type. */
  def range(column: String, lo: Option[Any], hi: Option[Any]): DeltaScanBuilder = {
    rangePredicates +:= ((column, lo.map(_.toString), hi.map(_.toString)))
    this
  }

  /** The pruned file manifest (path, partitionValues, size, stats). */
  def files(): DataFrame = {
    val (schema, _) = table.schemaAt(asOfVersion)
    var df = table.log.snapshotFilesDF(asOfVersion)
    partitionPredicates.foreach { case (c, vs) =>
      df = df.filter(element_at(col("partitionValues"), c).isin(vs.toSeq: _*))
    }
    if (rangePredicates.nonEmpty) {
      val statCols = StructType(schema.fields.filter(f => rangePredicates.exists(_._1 == f.name)))
      val statsSchema = StructType(Seq(
        StructField("numRecords", LongType),
        StructField("minValues", statCols),
        StructField("maxValues", statCols)))
      df = df.withColumn("graft_st", from_json(col("stats"), statsSchema))
      rangePredicates.foreach { case (c, lo, hi) =>
        val field = schema(c)
        val minC = col(s"graft_st.minValues.`$c`")
        val maxC = col(s"graft_st.maxValues.`$c`")
        // keep when stats are absent (can't prove exclusion)
        lo.foreach { l =>
          df = df.filter(maxC.isNull || maxC >= lit(l).cast(field.dataType))
        }
        hi.foreach { h =>
          df = df.filter(minC.isNull || minC <= lit(h).cast(field.dataType))
        }
      }
      df = df.drop("graft_st")
    }
    df
  }

  /** Pruned data read. The skipping predicates only drop whole files;
    * callers still apply the row-level filter on the result. */
  def toDF(): DataFrame = {
    val (schema, partCols) = table.schemaAt(asOfVersion)
    val pruned = files().select("path").collect().map(_.getString(0)).toSeq
    DeltaTable.readFiles(spark, table.tablePath, pruned, schema, partCols)
  }
}
