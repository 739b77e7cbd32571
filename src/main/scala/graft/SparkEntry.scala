package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, CurationQueries, ExtendedQueries, HygieneQueries, PipelineQueries, QueryDef, RelationalQueries, StatsQueries, TrainPrepQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from the per-module registries
  * (`graft.queries.*`); each entry pairs a Spark plan with (where
  * SQL-expressible) a DuckDB oracle over the same Parquet tables.
  */
object SparkEntry {

  /** All declared queries, in registry order. */
  def registry: Seq[QueryDef] =
    CoreQueries.all ++ RelationalQueries.all ++ PipelineQueries.all ++
      ExtendedQueries.all ++ CurationQueries.all ++ HygieneQueries.all ++
      TrainPrepQueries.all ++ StatsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
