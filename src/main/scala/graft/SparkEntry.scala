package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{DailyRollup, Weatherize}
import graft.queries.{ExtQueries, RelationalQueries, WeatherQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-family registries; every key has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (driver then records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's analytical heart (the 17-column daily rollup,
    * create sql:24-55) over the weatherized lineitem table.
    */
  def entry(spark: SparkSession): DataFrame =
    DailyRollup.rollup(Weatherize.lineitemAsHourly(
      Tables(spark, "/root/testdata/sf0.001", "lineitem")))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    WeatherQueries.queries ++ RelationalQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    WeatherQueries.oracles ++ RelationalQueries.oracles ++ ExtQueries.oracles
}
