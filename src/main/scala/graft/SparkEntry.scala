package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All verifiable operators, each a (Spark impl, optional DuckDB oracle). */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ FormatQueries.defs ++ IcebergQueries.defs ++ HudiQueries.defs ++
      SyncQueries.defs ++ Dedup.defs ++ Similarity.defs ++ TextOps.defs ++ Multimodal.defs ++
      Sketches.defs ++ StreamQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val fn = allDefs.head.fn
    fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
