package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-area modules; every entry with a DuckDB
  * oracle participates in the driver's hash-match correctness gate.
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    graft.queries.CoreQueries.defs ++
      graft.queries.RefOpQueries.defs ++
      graft.queries.TrainQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.AnalyticsQueries.defs ++
      graft.queries.ArchiveQueries.defs ++
      graft.queries.MoreTpchQueries.defs ++
      graft.queries.TpchSubqueries.defs ++
      graft.queries.CorpusOpsQueries.defs ++
      graft.queries.EditorialQueries.defs ++
      graft.queries.CurationQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q5_local_supplier").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
