package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventQueries, PipelineQueries, Relational, StoreQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's end-to-end query;
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash compare.
  * Keys without an oracle get the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The end-to-end curation pipeline: canonical dedup →
    * quality scoring → prose filter → language ID → per-language
    * corpus rollup, one DataFrame plan. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.pipelineCuration(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ StoreQueries.queries ++
      PipelineQueries.queries ++ EventQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ StoreQueries.oracles ++
      PipelineQueries.oracles ++ EventQueries.oracles
}
