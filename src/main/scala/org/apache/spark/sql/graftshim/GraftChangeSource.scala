package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable

/** A commit token as a streaming offset (JSON = the token itself). */
final case class GraftStreamOffset(token: String) extends OffsetV1 {
  override def json: String = token
}

/**
 * V1 Structured Streaming source over a table's commit log — the change
 * feed (`changesAsDF`) as micro-batches: batch 0 is the snapshot at the
 * stream's first observed commit, each later batch is the rows added by
 * the commits in `(startToken, endToken]`. The same shape for all three
 * formats (Delta versions, Iceberg snapshot ids, Hudi instants) — the
 * streaming twin of the reference's incremental sync pipeline (ref
 * `api/.../spi/extractor/ExtractFromSource.java:40-52`, SURVEY.md §2.9).
 *
 * COW append/overwrite semantics: batches carry ADDED rows only
 * (removals are metadata); a Hudi rollback that revokes an instant the
 * stream already emitted surfaces as an error on the next batch, like
 * any non-replayable history gap.
 */
final class GraftChangeSource(
    spark: SparkSession, fmt: String, path: String) extends Source {

  /** Commit tokens oldest → newest, re-listed per micro-batch. */
  private def tokens: Seq[String] = fmt match {
    case "delta"   => DeltaTable.forPath(spark, path).log.listVersions().map(_.toString)
    case "iceberg" => IcebergTable.forPath(spark, path).snapshotIds.map(_.toString)
    case "hudi"    => HudiTable.forPath(spark, path).instants
  }

  override val schema: StructType = fmt match {
    case "delta"   => DeltaTable.forPath(spark, path).toDF().schema
    case "iceberg" => IcebergTable.forPath(spark, path).toDF().schema
    case "hudi"    => HudiTable.forPath(spark, path).toDF().schema
  }

  override def getOffset: Option[OffsetV1] = tokens.lastOption.map(GraftStreamOffset)

  /** Works for live [[GraftStreamOffset]]s and the serialized offsets
    * the runtime replays from the offset log (json IS the token). */
  private def tokenOf(o: OffsetV1): String = o.json

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endTok = tokenOf(end)
    val batch = start.map(tokenOf) match {
      case Some(s) if s == endTok =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(s) => changesBetween(s, endTok)
      case None => snapshotAt(endTok)
    }
    // a stream's schema is fixed at start; evolved batches project back
    val aligned = batch.select(schema.fieldNames.map(col).toSeq: _*)
    // V1 contract: the returned frame must be a streaming Dataset
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(aligned.queryExecution.toRdd, schema, isStreaming = true)
  }

  private def changesBetween(fromExclusive: String, toInclusive: String): DataFrame = fmt match {
    case "delta"   => DeltaTable.forPath(spark, path).changesAsDF(fromExclusive.toLong, toInclusive.toLong)
    case "iceberg" => IcebergTable.forPath(spark, path).changesAsDF(fromExclusive.toLong, toInclusive.toLong)
    case "hudi"    => HudiTable.forPath(spark, path).changesAsDF(fromExclusive, toInclusive)
  }

  private def snapshotAt(token: String): DataFrame = fmt match {
    case "delta"   => DeltaTable.forPath(spark, path).toDF(Some(token.toLong))
    case "iceberg" => IcebergTable.forPath(spark, path).toDF(Some(token.toLong))
    case "hudi"    => HudiTable.forPath(spark, path).toDF(Some(token))
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
}
