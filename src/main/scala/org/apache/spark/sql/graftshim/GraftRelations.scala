package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/**
 * The one `private[sql]`-crossing hop the engine needs: build a
 * DataFrame over a [[FileIndex]]-backed parquet relation. This is how a
 * table format plugs a metadata-defined file listing into Spark's V1
 * file-scan machinery (`FileSourceScanExec`) — partition pruning,
 * filter pushdown, and column pruning all apply to the planned scan,
 * and Spark never lists or stats the filesystem itself.
 */
object GraftRelations {

  def parquetRelation(
      spark: SparkSession,
      index: FileIndex,
      partitionSchema: StructType,
      dataSchema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    relation(spark, index, partitionSchema, dataSchema, "parquet", options)

  /** Same planning for any supported data-file format (ref
    * `api/.../model/storage/FileFormat.java:26-30`): "parquet" uses
    * Spark's vectorized reader, "avro" the [[GraftAvroFileFormat]]
    * decoder — both behind the identical FileIndex/relation machinery. */
  def relation(
      spark: SparkSession,
      index: FileIndex,
      partitionSchema: StructType,
      dataSchema: StructType,
      format: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val fileFormat = format.toLowerCase match {
      case "parquet" => new ParquetFileFormat
      case "avro"    => new GraftAvroFileFormat
      case "orc"     => new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
      case other     => throw new IllegalArgumentException(s"unsupported file format: $other")
    }
    val rel = HadoopFsRelation(
      location = index,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = fileFormat,
      options = options)(spark)
    ClassicDataset.ofRows(
      spark.asInstanceOf[ClassicSession],
      LogicalRelation(rel, isStreaming = false))
  }
}
