package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (and the LLM-pipeline extensions) has one
  * entry in [[queries]]; each SQL-expressible one has a matching DuckDB
  * oracle in [[oracleSql]] with identical output column names. Queries live
  * in `graft.queries.*`, implemented on top of the operator library
  * (`graft.ops`, `graft.aram`, `graft.llm`, `graft.streaming`).
  */
object SparkEntry {

  import _root_.graft.{queries => q}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.FlagshipQuery.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    q.RelationalQueries.queries ++
      q.PreprocessQueries.queries ++
      q.TextQueries.queries ++
      q.EventsQueries.queries ++
      q.EmbeddingQueries.queries ++
      q.FlagshipQuery.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    q.RelationalQueries.oracle ++
      q.PreprocessQueries.oracle ++
      q.TextQueries.oracle ++
      q.EventsQueries.oracle ++
      q.EmbeddingQueries.oracle ++
      q.FlagshipQuery.oracle
}
