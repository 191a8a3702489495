package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable

/**
 * `spark.read.format("graft")` / `df.write.format("graft")` — the
 * engine's DataSource registration (SURVEY.md §4's optional
 * `TableProvider`; the V1 relation route is the one Delta Lake itself
 * uses, because a `HadoopFsRelation` plugs straight into
 * `FileSourceScanExec` with partition pruning, filter pushdown, and
 * column pruning intact).
 *
 * Read options:
 *  - `format`: delta | iceberg | hudi (default: detect from the table's
 *    marker directory `_delta_log` / `metadata` / `.hoodie`)
 *  - `versionAsOf`: time travel — a Delta version, Iceberg snapshot id,
 *    or Hudi instant
 *  - `timestampAsOf`: time travel by wall clock (epoch millis or
 *    ISO date/datetime, UTC); resolves to the latest commit at-or-before
 *
 * Write options: `format` (required), `partitionBy` (comma list; Delta
 * generated-column / Iceberg transform specs accepted). SaveMode.Append
 * appends, Overwrite overwrites, ErrorIfExists creates.
 *
 * Column order note: like Delta's own relation, partition columns
 * surface after data columns (HadoopFsRelation contract), which may
 * differ from the table-schema order `GraftTable.toDF` presents.
 */
final class GraftDataSource
    extends RelationProvider with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // ------------------------------------------------------------ streaming
  // `spark.readStream.format("graft").load(path)` — the table's change
  // feed as micro-batches (snapshot first, then per-commit adds).

  private def streamSource(
      spark: SparkSession, parameters: Map[String, String]): (String, String) = {
    val opts = caseInsensitive(parameters)
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("graft stream needs a path: .load(<tablePath>)"))
    val fmt = opts.get("format").map(_.toLowerCase)
      .getOrElse(GraftDataSource.detectFormat(spark, path))
    (fmt, path)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (fmt, path) = streamSource(sqlContext.sparkSession, parameters)
    // an explicit .schema(...) is the pin authority (the cross-JVM
    // restart escape hatch); otherwise prefer a schema already pinned
    // by a checkpointed stream over this table in this JVM, so a
    // restarted stream analyzes on its pinned start schema even after
    // the table evolved (GraftChangeSource doc)
    ("graft", schema.getOrElse(org.apache.spark.sql.graftshim.GraftChangeSource
      .analysisSchema(sqlContext.sparkSession, fmt, path)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val (fmt, path) = streamSource(sqlContext.sparkSession, parameters)
    val opts = caseInsensitive(parameters)
    def intOpt(k: String): Option[Int] = opts.get(k.toLowerCase).map { v =>
      val n = v.toInt
      require(n > 0, s"$k must be positive, got $v")
      n
    }
    new org.apache.spark.sql.graftshim.GraftChangeSource(
      sqlContext.sparkSession, fmt, path,
      metadataPath = Some(metadataPath),
      maxCommitsPerTrigger = intOpt("maxCommitsPerTrigger"),
      maxFilesPerTrigger = intOpt("maxFilesPerTrigger"),
      userSchema = schema)
  }

  // `df.writeStream.format("graft")` — each micro-batch lands as one
  // exactly-once table commit (GraftStreamSink).
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val opts = caseInsensitive(parameters)
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("graft stream sink needs a path: .start(<tablePath>)"))
    val fmt = opts.get("format").map(_.toLowerCase)
      .getOrElse(GraftDataSource.detectFormat(sqlContext.sparkSession, path))
    val partCols =
      if (partitionColumns.nonEmpty) partitionColumns
      else opts.get("partitionby").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    new org.apache.spark.sql.graftshim.GraftStreamSink(
      sqlContext.sparkSession, fmt, path, partCols, outputMode)
  }

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val opts = caseInsensitive(parameters)
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("graft source needs a path: .load(<tablePath>)"))
    val fmt = opts.get("format").map(_.toLowerCase)
      .getOrElse(GraftDataSource.detectFormat(spark, path))
    val asOf = opts.get("versionasof")
    val tsOf = opts.get("timestampasof").map(GraftDataSource.parseTimestampMillis)
    require(asOf.isEmpty || tsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val df = fmt match {
      case "delta" =>
        val t = DeltaTable.forPath(spark, path)
        t.toDF(asOf.map(_.toLong).orElse(tsOf.map(t.versionForTimestamp)))
      case "iceberg" =>
        val t = IcebergTable.forPath(spark, path)
        t.toDF(asOf.map(_.toLong).orElse(
          tsOf.map(ts => t.currentMetadata.snapshotForTimestamp(ts).snapshotId)))
      case "hudi" =>
        val t = HudiTable.forPath(spark, path)
        t.toDF(asOf.orElse(tsOf.map(t.instantForTimestamp)))
      case other => throw new IllegalArgumentException(s"unknown graft format: $other")
    }
    GraftDataSource.fsRelationOf(df).getOrElse(throw new UnsupportedOperationException(
      s"table at $path plans as multiple relations (mixed data-file formats); " +
        "read it through the library API (e.g. IcebergTable.forPath(...).toDF())"))
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val opts = caseInsensitive(parameters)
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("graft sink needs a path: .save(<tablePath>)"))
    val fmt = opts.getOrElse("format",
      throw new IllegalArgumentException("graft sink needs .option(\"format\", delta|iceberg|hudi)"))
      .toLowerCase
    val partCols = opts.get("partitionby").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val df = data.toDF()
    val exists = GraftDataSource.tableExists(spark, path, fmt)
    (mode, exists) match {
      case (SaveMode.ErrorIfExists, true) =>
        throw new IllegalArgumentException(s"graft $fmt table already exists at $path")
      case (SaveMode.Ignore, true) => ()
      case (m, true) =>
        val over = m == SaveMode.Overwrite
        fmt match {
          case "delta" =>
            val t = DeltaTable.forPath(spark, path)
            if (over) t.overwrite(df, partCols) else t.append(df, partCols)
          case "iceberg" =>
            val t = IcebergTable.forPath(spark, path)
            if (over) t.overwrite(df, partCols) else t.append(df, partCols)
          case "hudi" =>
            val t = HudiTable.forPath(spark, path)
            if (over) t.overwrite(df, partCols) else t.append(df, partCols)
          case other => throw new IllegalArgumentException(s"unknown graft format: $other")
        }
      case (_, false) =>
        fmt match {
          case "delta"   => DeltaTable.create(spark, path, df, partCols)
          case "iceberg" => IcebergTable.create(spark, path, df, partCols)
          case "hudi"    => HudiTable.create(spark, path, df, partCols)
          case other => throw new IllegalArgumentException(s"unknown graft format: $other")
        }
    }
    createRelation(sqlContext, parameters + ("format" -> fmt))
  }

  private def caseInsensitive(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) => k.toLowerCase -> v }
}

object GraftDataSource {

  /** `timestampAsOf` accepts epoch millis, `yyyy-MM-dd`, or
    * `yyyy-MM-dd HH:mm:ss[.S]` (UTC — the engine's session zone). */
  private[graft] def parseTimestampMillis(s: String): Long = {
    val t = s.trim
    if (t.matches("-?\\d+")) t.toLong
    else if (t.length <= 10)
      java.time.LocalDate.parse(t).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    else
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  /** Identify a table by its metadata marker directory. */
  def detectFormat(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(p, "_delta_log"))) "delta"
    else if (fs.exists(new Path(p, ".hoodie"))) "hudi"
    else if (fs.exists(new Path(p, "metadata"))) "iceberg"
    else throw new IllegalArgumentException(
      s"no graft table at $path (no _delta_log/.hoodie/metadata marker); " +
        "pass .option(\"format\", ...) to create one")
  }

  def tableExists(spark: SparkSession, path: String, fmt: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = fmt match {
      case "delta" => "_delta_log"
      case "hudi" => ".hoodie"
      case _ => "metadata"
    }
    fs.exists(new Path(p, marker))
  }

  /** The single file-scan relation of a planned table read, if the plan
    * is shaped as (projections over) one HadoopFsRelation. */
  private[graft] def fsRelationOf(df: DataFrame): Option[HadoopFsRelation] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    } match {
      case Seq(rel) => Some(rel)
      case _ => None
    }
}
