package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CleanWeather, DailyRollup, Retention, Weatherize}

/** Oracle-checked queries exercising the weather-domain pipeline
  * (SURVEY.md §2d rollup, §2c scalar surface, §2b retention) on the shared
  * lineitem table via the deterministic [[graft.ops.Weatherize]] mapping.
  * Because the mapping is pure column arithmetic, the composed pipeline is
  * expressible as plain DuckDB SQL for the oracle.
  */
object WeatherQueries {

  val incrementalDate: java.sql.Date = java.sql.Date.valueOf("1995-06-17")

  private def hourly(s: SparkSession, dir: String): DataFrame =
    Weatherize.lineitemAsHourly(Tables(s, dir, "lineitem"))

  /** Which sf-dir the `hourly_sql` temp view of each session currently
    * reads (weak keys: a stopped session must not be pinned by this
    * cache). Guards w06's once-per-session view registration.
    */
  private val hourlyViewDir =
    new java.util.WeakHashMap[SparkSession, String]()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w01_daily_rollup_full" -> ((s, dir) =>
      DailyRollup.rollup(hourly(s, dir))),

    "w02_daily_rollup_incremental" -> ((s, dir) =>
      DailyRollup.rollup(hourly(s, dir), Some(incrementalDate))),

    "w03_retention_keep" -> ((s, dir) => {
      val h = hourly(s, dir)
      // asOf = max(dt) derived from the data (never wall-clock); tiny
      // 1-row aggregate broadcast to every partition of the filter.
      val asOf = h.agg(max(col("dt")).as("as_of"))
      Retention.keep(h.crossJoin(broadcast(asOf)), col("as_of"))
        .groupBy(col("dt")).agg(count(lit(1)).as("n_rows"))
        .orderBy(col("dt"))
    }),

    // P1 under the oracle (VERDICT.md #4): the clean reshape's renames
    // (grnd_level→ground_level, deg→degree, 1h→rain_1h), array-head
    // weather semantics (null on empty array), and whole-struct-null
    // rain — projected flat and compared row-by-row.
    //
    // Deterministic order comes from sorting the INPUT on
    // (l_orderkey, l_linenumber) — vis_key = l_orderkey*10+l_linenumber
    // is monotone in that pair (l_linenumber < 10), and the row-wise
    // projection preserves order ([[Sorted.byKey]]): ~2× faster than
    // sorting the projected output at sf0.1.
    "w04_clean_project" -> ((s, dir) =>
      CleanWeather.clean(
        Weatherize.lineitemAsApi(Sorted.byKey(Tables(s, dir, "lineitem"),
          col("l_orderkey"), col("l_linenumber"))),
        col("dt0"), col("ct0"))
        .select(
          col("visibility").as("vis_key"),
          col("weather.id").as("weather_id"),
          col("weather.main").as("weather_main"),
          col("main.ground_level").as("ground_level"),
          col("wind.degree").as("wind_degree"),
          col("wind.gust").as("gust"),
          col("rain.rain_1h").as("rain_1h"),
          col("dt"), col("current_time"))),

    // P1 ∘ A1-A6: the full reference path (clean then rollup) end-to-end;
    // must agree with the same rollup computed straight from lineitem.
    "w05_clean_then_rollup" -> ((s, dir) =>
      DailyRollup.rollup(CleanWeather.clean(
        Weatherize.lineitemAsApi(Tables(s, dir, "lineitem")),
        col("dt0"), col("ct0")))),

    // The flagship rollup as a SQL TEXT query — the reference's actual
    // artifact is a SQL stored procedure (create sql:24-55), so the
    // strongest parity statement is executing the equivalent SQL
    // through spark.sql against the hourly view. Semantics mirror
    // DailyRollup.rollup expression-for-expression (same numeric
    // till_secs aggregation keeping the agg hash-based, same rounding,
    // same EOD CASE), and the oracle is w01's SQL verbatim.
    "w06_rollup_sql" -> ((s, dir) => {
      // Register the hourly view once per (session, sf-dir) — bench
      // reps re-invoke this function, and re-running the view DDL per
      // rep was the one structural difference between w06 and w01.
      // (Round-7 isolation measurement: w06 1.73-1.80s vs w01
      // 1.84-2.02s steady-state at sf0.1, so the r6 3.89s outlier was
      // bench-context noise, not this path — see PLANS.md. The check
      // still removes per-rep catalog churn for free.)
      val fresh = hourlyViewDir.synchronized {
        val stale = !s.catalog.tableExists("hourly_sql") ||
          !Option(hourlyViewDir.get(s)).contains(dir)
        if (stale) hourlyViewDir.put(s, dir)
        stale
      }
      if (fresh)
        Weatherize.lineitemAsHourly(Tables(s, dir, "lineitem"))
          .createOrReplaceTempView("hourly_sql")
      s.sql("""
        WITH agg AS (
          SELECT dt,
            round(avg(main.temp - 273.15), 2) AS avg_temp,
            round(max(main.temp_max - 273.15), 2) AS max_temp,
            round(min(main.temp_min - 273.15), 2) AS min_temp,
            round(avg(main.feels_like - 273.15), 2) AS feels_like,
            round(avg(main.pressure), 0) AS avg_pressure,
            CAST(max(main.pressure) AS DOUBLE) AS max_pressure,
            CAST(min(main.pressure) AS DOUBLE) AS min_pressure,
            round(avg(main.humidity), 0) AS avg_humidity,
            CAST(max(main.humidity) AS DOUBLE) AS max_humidity,
            CAST(min(main.humidity) AS DOUBLE) AS min_humidity,
            round(avg(clouds.`all`), 0) AS avg_cloud_coverage,
            CAST(max(clouds.`all`) AS DOUBLE) AS max_cloud_coverage,
            CAST(min(clouds.`all`) AS DOUBLE) AS min_cloud_coverage,
            max(rain.rain_1h) AS max_rain_1h,
            max(rain.rain_3h) AS max_rain_3h,
            max(CAST(substring(`current_time`, 1, 2) AS BIGINT) * 3600 +
                CAST(substring(`current_time`, 4, 2) AS BIGINT) * 60 +
                CAST(substring(`current_time`, 7, 2) AS BIGINT)) AS till_secs
          FROM hourly_sql
          GROUP BY dt)
        SELECT avg_temp, max_temp, min_temp, feels_like,
          avg_pressure, max_pressure, min_pressure,
          avg_humidity, max_humidity, min_humidity,
          avg_cloud_coverage, max_cloud_coverage, min_cloud_coverage,
          max_rain_1h, max_rain_3h,
          dt,
          month(dt) AS month,
          CASE WHEN till_secs > 23 * 3600 THEN 'EOD'
               ELSE format_string('%02d:%02d:%02d',
                 CAST(till_secs / 3600 AS BIGINT),
                 CAST((till_secs % 3600) / 60 AS BIGINT),
                 till_secs % 60) END AS till_time
        FROM agg
        ORDER BY dt
      """)
    }),
  )

  /** Shared 17-column rollup SELECT, written against lineitem with the
    * Weatherize arithmetic inlined. Expression shapes mirror the Spark
    * side exactly (same operation order) so non-avg aggregates are
    * bit-identical and avg aggregates agree after ROUND.
    */
  private def rollupSql(where: String): String = {
    val t = "printf('%02d:%02d:%02d', l_orderkey % 24, (l_linenumber * 9) % 60, l_suppkey % 60)"
    s"""SELECT
       |  round(avg((l_extendedprice / 100.0 + 273.15) - 273.15), 2) AS avg_temp,
       |  round(max(((l_extendedprice / 100.0 + 273.15) * (1.0 + l_tax)) - 273.15), 2) AS max_temp,
       |  round(min(((l_extendedprice / 100.0 + 273.15) * (1.0 - l_discount)) - 273.15), 2) AS min_temp,
       |  round(avg(((l_extendedprice * (1.0 - l_discount)) / 100.0 + 273.15) - 273.15), 2) AS feels_like,
       |  round(avg(950 + l_partkey % 100), 0) AS avg_pressure,
       |  CAST(max(950 + l_partkey % 100) AS DOUBLE) AS max_pressure,
       |  CAST(min(950 + l_partkey % 100) AS DOUBLE) AS min_pressure,
       |  round(avg(l_suppkey % 101), 0) AS avg_humidity,
       |  CAST(max(l_suppkey % 101) AS DOUBLE) AS max_humidity,
       |  CAST(min(l_suppkey % 101) AS DOUBLE) AS min_humidity,
       |  round(avg(l_orderkey % 101), 0) AS avg_cloud_coverage,
       |  CAST(max(l_orderkey % 101) AS DOUBLE) AS max_cloud_coverage,
       |  CAST(min(l_orderkey % 101) AS DOUBLE) AS min_cloud_coverage,
       |  max(CASE WHEN l_returnflag = 'R' THEN l_quantity / 25.0 END) AS max_rain_1h,
       |  max(CASE WHEN l_returnflag = 'R' THEN l_quantity / 10.0 END) AS max_rain_3h,
       |  CAST(l_shipdate AS DATE) AS dt,
       |  CAST(EXTRACT(MONTH FROM CAST(l_shipdate AS DATE)) AS INTEGER) AS month,
       |  CASE WHEN max($t) > '23:00:00' THEN 'EOD' ELSE max($t) END AS till_time
       |FROM lineitem
       |$where
       |GROUP BY CAST(l_shipdate AS DATE)
       |ORDER BY dt""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "w01_daily_rollup_full" -> rollupSql(""),
    "w02_daily_rollup_incremental" ->
      rollupSql("WHERE CAST(l_shipdate AS DATE) = DATE '1995-06-17'"),
    "w03_retention_keep" ->
      """SELECT dt, count(*) AS n_rows
        |FROM (SELECT CAST(l_shipdate AS DATE) AS dt FROM lineitem)
        |WHERE dt > (SELECT max(CAST(l_shipdate AS DATE)) FROM lineitem) - 15
        |GROUP BY dt
        |ORDER BY dt""".stripMargin,

    "w04_clean_project" ->
      """SELECT l_orderkey * 10 + l_linenumber AS vis_key,
        |  CASE WHEN l_linenumber = 7 THEN NULL
        |       ELSE 800 + l_orderkey % 4 END AS weather_id,
        |  CASE WHEN l_linenumber = 7 THEN NULL
        |       ELSE l_returnflag END AS weather_main,
        |  CASE WHEN l_linenumber <= 5 THEN 955 + l_partkey % 100 END AS ground_level,
        |  l_orderkey % 360 AS wind_degree,
        |  CASE WHEN l_linenumber > 3 THEN l_quantity / 5.0 END AS gust,
        |  CASE WHEN l_returnflag = 'R' THEN l_quantity / 25.0 END AS rain_1h,
        |  CAST(l_shipdate AS DATE) AS dt,
        |  printf('%02d:%02d:%02d', l_orderkey % 24, (l_linenumber * 9) % 60,
        |         l_suppkey % 60) AS current_time
        |FROM lineitem
        |ORDER BY vis_key""".stripMargin,

    "w05_clean_then_rollup" -> rollupSql(""),
    "w06_rollup_sql" -> rollupSql(""),
  )
}
