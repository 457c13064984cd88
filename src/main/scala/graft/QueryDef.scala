package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      query: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, query, Some(oracle))

  def noOracle(name: String)(
      query: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, query, None)
}
