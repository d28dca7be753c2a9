package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark query over the TESTDATA
  * tables plus (when SQL-expressible) a DuckDB oracle over the same
  * parquet. Column names/order must match between the two — the driver
  * sorts columns by name and hashes values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(fn, Some(oracle))
}
