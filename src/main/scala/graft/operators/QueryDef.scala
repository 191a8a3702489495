package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable operator: a Spark implementation plus (when the
 * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
 * over the same parquet tables. Queries without an oracle get the
 * driver's weaker rows-only check.
 *
 * Determinism rules followed by every query (so hash-compare is stable):
 *  - no floating-point SUM/AVG: money-ish doubles are cast to
 *    DECIMAL(18,s) before aggregation (exact, order-independent), with an
 *    explicit final cast so Spark and DuckDB result schemas agree;
 *  - every result has a total ORDER BY on a unique key prefix;
 *  - integer-typed function outputs are cast explicitly (DuckDB year()
 *    returns BIGINT, Spark returns INT, etc.).
 */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String, fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
