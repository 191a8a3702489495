package graft.stats

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

import graft.model.ColumnStatRow
import scala.jdk.CollectionConverters._

/** Footer-derived per-file facts: row count, byte size, per-column stats. */
final case class FileFooterStats(
    path: String,
    fileSizeBytes: Long,
    recordCount: Long,
    modificationTime: Long,
    columns: Seq[ColumnStatRow])

/**
 * Distributed parquet-footer statistics collector: the engine's analog of
 * the reference's file-stats readers (ref
 * `core/.../hudi/HudiFileStatsExtractor.java:105-184` — per-file footer
 * min/max/nullCount/valueCount). Where the reference walks footers with a
 * driver-side parallel stream, we `mapPartitions` over the file list so
 * stats collection scales with executors, not driver cores — at 100 TB a
 * manifest has millions of files and footer reads are the bottleneck.
 *
 * Min/max are canonicalized to strings (SURVEY.md §1.1 `ColumnStat`):
 * dates as epoch-days, timestamps as epoch-micros, decimals unscaled —
 * matching the reference's Range canonical form (`Range.java:31-56`).
 */
object ParquetFooterStats {

  def collect(spark: SparkSession, paths: Seq[String]): Seq[FileFooterStats] = {
    if (paths.isEmpty) return Seq.empty
    // Metadata-small lists read on the driver: a footer read is
    // single-digit ms, so scheduling a Spark job (fixed ~50-150 ms of
    // scheduler + collect latency) for a handful of files costs more
    // than the work itself — and every commit in the format plane pays
    // this per write (guide §1.2). Big manifests still fan out across
    // the cluster, where footer reads ARE the bottleneck at 100 TB.
    if (paths.size <= 16) {
      val conf0 = spark.sparkContext.hadoopConfiguration
      return paths.map(p => readFooter(conf0, p))
    }
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val parallelism = math.max(1, math.min(paths.size / 4 + 1, 256))
    spark.sparkContext
      .parallelize(paths, parallelism)
      .map(p => readFooter(conf.value, p))
      .collect()
      .toSeq
  }

  /** Footer stats for one file (runs on executors). */
  def readFooter(conf: Configuration, pathStr: String): FileFooterStats = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val status = fs.getFileStatus(path)
    val footer = ParquetFileReader.readFooter(
      HadoopInputFile.fromStatus(status, conf),
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val schema = footer.getFileMetaData.getSchema
    val blocks = footer.getBlocks.asScala
    val rowCount = blocks.map(_.getRowCount).sum

    // column dot-path -> aggregated stats across row groups
    val byColumn = blocks.flatMap(_.getColumns.asScala).groupBy(_.getPath.toDotString)
    val colStats = byColumn.toSeq.sortBy(_._1).map { case (dotPath, chunks) =>
      val primitive = schema.getColumnDescription(chunks.head.getPath.toArray).getPrimitiveType
      var min: Option[AnyRef] = None
      var max: Option[AnyRef] = None
      var nulls = 0L
      var values = 0L
      var size = 0L
      var statsOk = true
      chunks.foreach { c =>
        values += c.getValueCount
        size += c.getTotalSize
        val s = c.getStatistics
        if (s == null || !s.isNumNullsSet) statsOk = false
        else {
          nulls += s.getNumNulls
          if (s.hasNonNullValue) {
            val cmp = s.comparator.asInstanceOf[java.util.Comparator[AnyRef]]
            val lo = s.genericGetMin.asInstanceOf[AnyRef]
            val hi = s.genericGetMax.asInstanceOf[AnyRef]
            if (min.isEmpty || cmp.compare(lo, min.get) < 0) min = Some(lo)
            if (max.isEmpty || cmp.compare(hi, max.get) > 0) max = Some(hi)
          }
        }
      }
      // INT96 (legacy Spark timestamps): parquet's min/max ordering for
      // the type is broken/deprecated — record counts but never ranges
      val rangeOk = statsOk &&
        primitive.getPrimitiveTypeName != PrimitiveTypeName.INT96
      ColumnStatRow(
        column = dotPath,
        minValue = if (rangeOk) min.map(v => canonical(primitive, v)) else None,
        maxValue = if (rangeOk) max.map(v => canonical(primitive, v)) else None,
        numNulls = if (statsOk) nulls else -1L,
        numValues = values,
        totalSize = size)
    }
    FileFooterStats(pathStr, status.getLen, rowCount, status.getModificationTime, colStats)
  }

  /**
   * Canonical string form of a parquet statistics value. Logical-type
   * aware: UTF8 binary → string, DECIMAL → unscaled-aware plain string,
   * DATE stays epoch-days, TIMESTAMP stays epoch-(unit as written).
   */
  private def canonical(t: org.apache.parquet.schema.PrimitiveType, v: AnyRef): String = {
    import LogicalTypeAnnotation._
    val logical = t.getLogicalTypeAnnotation
    (t.getPrimitiveTypeName, logical) match {
      case (PrimitiveTypeName.BINARY, _: StringLogicalTypeAnnotation) =>
        new String(v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes, "UTF-8")
      case (PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY,
            d: DecimalLogicalTypeAnnotation) =>
        val bytes = v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale).toPlainString
      case (PrimitiveTypeName.INT64, ts: TimestampLogicalTypeAnnotation) =>
        // canonical timestamp form: epoch-micros regardless of file unit
        val raw = v.asInstanceOf[Number].longValue
        val micros = ts.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS => Math.multiplyExact(raw, 1000L)
          case LogicalTypeAnnotation.TimeUnit.MICROS => raw
          case LogicalTypeAnnotation.TimeUnit.NANOS  => Math.floorDiv(raw, 1000L)
        }
        micros.toString
      case (PrimitiveTypeName.INT32, d: DecimalLogicalTypeAnnotation) =>
        java.math.BigDecimal.valueOf(v.asInstanceOf[Number].longValue, d.getScale).toPlainString
      case (PrimitiveTypeName.INT64, d: DecimalLogicalTypeAnnotation) =>
        java.math.BigDecimal.valueOf(v.asInstanceOf[Number].longValue, d.getScale).toPlainString
      case (PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY, _) =>
        java.util.Base64.getEncoder.encodeToString(
          v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
      case _ => v.toString
    }
  }

  /** The file list of a directory-or-file parquet dataset. Paths stay
    * fully qualified so scheme/authority survive for remote filesystems. */
  def listParquetFiles(spark: SparkSession, location: String): Seq[String] = {
    val p = new Path(location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path): Seq[String] = {
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) Seq(st.getPath.toString)
        else Seq.empty
      }
    }
    val st = fs.getFileStatus(p)
    if (st.isDirectory) walk(p) else Seq(fs.makeQualified(p).toString)
  }

  /** Stats as a DataFrame for distributed stat algebra / inspection. */
  def toDataFrame(spark: SparkSession, stats: Seq[FileFooterStats]): DataFrame = {
    import spark.implicits._
    spark.createDataset(stats).toDF()
  }
}
