package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mapping from the driver's `lineitem` table onto the
  * canonical raw hourly weather schema ([[graft.schema.WeatherSchema.raw]]).
  *
  * Purpose: lets the weather-domain operators (CleanWeather → DailyRollup →
  * upsert/retention) be exercised and DuckDB-oracle-checked on the shared
  * test tables, since the oracle can only see the parquet the driver
  * provides. The mapping is pure column arithmetic, so the composed
  * pipeline (weatherize ∘ rollup) stays expressible as plain SQL for the
  * oracle side.
  *
  * Mapping (all derived from lineitem columns, no wall clock, no rand):
  *  - dt            ← date(l_shipdate)
  *  - current_time  ← "HH:MM:SS" built from l_orderkey/l_linenumber so
  *                    that late-evening values (incl. > "23:00:00") occur,
  *                    exercising the EOD CASE boundary (create sql:45-49)
  *  - main.temp     ← l_extendedprice/100 + 273.15 (Kelvin-ish)
  *  - main.temp_max ← temp * (1 + l_tax), temp_min ← temp * (1 - l_discount)
  *  - feels_like    ← l_extendedprice*(1-l_discount)/100 + 273.15
  *  - pressure      ← 950 + l_partkey % 100, humidity ← l_suppkey % 101
  *  - clouds.all    ← l_orderkey % 101
  *  - rain_1h/3h    ← quantity-derived, NULL unless l_returnflag = 'R'
  *                    (keeps whole groups all-NULL → NULL-skipping MAX path)
  */
object Weatherize {

  /** lineitem → the PRE-clean OpenWeather API shape
    * ([[graft.schema.WeatherSchema.api]]), so the CleanWeather reshape
    * (P1) can be exercised end-to-end under the DuckDB oracle. Exercises
    * every rename/guard the clean step owns:
    *  - `weather` is an ARRAY, EMPTY for l_linenumber = 7 rows (the
    *    main.py:90-92 head-of-array null path);
    *  - `grnd_level` present only for l_linenumber <= 5 (null-guard
    *    path of main.py:98-105), renamed `ground_level` by clean;
    *  - `wind.deg` (renamed `degree`), `wind.gust` null for
    *    l_linenumber <= 3;
    *  - `rain` is a WHOLE-STRUCT NULL for non-'R' rows (absent branch,
    *    fields `1h`/`3h` renamed `rain_1h`/`rain_3h`);
    *  - `visibility` = l_orderkey·10 + l_linenumber — unique, the
    *    deterministic sort key for the oracle compare;
    *  - ingestion stamps `dt0`/`ct0` ride along as extra columns for the
    *    caller to inject into `CleanWeather.clean` (P2 determinism).
    */
  def lineitemAsApi(lineitem: DataFrame): DataFrame = {
    val temp = col("l_extendedprice") / 100.0 + 273.15
    lineitem.select(
      struct(lit(87.0).as("lon"), lit(23.25).as("lat")).as("coord"),
      when(col("l_linenumber") === 7,
        array().cast("array<struct<id:bigint,main:string,description:string>>"))
        .otherwise(array(struct(
          (lit(800L) + col("l_orderkey") % 4).as("id"),
          col("l_returnflag").as("main"),
          col("l_linestatus").as("description")))).as("weather"),
      lit("stations").as("base"),
      struct(
        temp.as("temp"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) / 100.0 + 273.15).as("feels_like"),
        (lit(950L) + col("l_partkey") % 100).as("pressure"),
        (col("l_suppkey") % 101).as("humidity"),
        (temp * (lit(1.0) - col("l_discount"))).as("temp_min"),
        (temp * (lit(1.0) + col("l_tax"))).as("temp_max"),
        lit(null).cast("long").as("sea_level"),
        when(col("l_linenumber") <= 5, lit(955L) + col("l_partkey") % 100)
          .as("grnd_level")).as("main"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("visibility"),
      struct(
        (col("l_quantity") / 10.0).as("speed"),
        (col("l_orderkey") % 360).as("deg"),
        when(col("l_linenumber") > 3, col("l_quantity") / 5.0).as("gust")).as("wind"),
      struct((col("l_orderkey") % 101).as("all")).as("clouds"),
      when(col("l_returnflag") === "R", struct(
        (col("l_quantity") / 25.0).as("1h"),
        (col("l_quantity") / 10.0).as("3h")))
        .as("rain"),
      lit(null).cast("struct<1h:double,3h:double>").as("snow"),
      struct(
        lit("IN").as("country"),
        (col("l_orderkey") % 86400).as("sunrise"),
        (col("l_orderkey") % 86400 + 43200).as("sunset")).as("sys"),
      lit(19800L).as("timezone"),
      lit("Bankura").as("name"),
      to_date(col("l_shipdate")).as("dt0"),
      format_string("%02d:%02d:%02d",
        col("l_orderkey") % 24, col("l_linenumber") * 9 % 60, col("l_suppkey") % 60)
        .as("ct0"))
  }

  def lineitemAsHourly(lineitem: DataFrame): DataFrame = {
    val temp = col("l_extendedprice") / 100.0 + 273.15
    lineitem.select(
      struct(lit(87.0).as("longitude"), lit(23.25).as("latitude")).as("coordinate"),
      struct(
        (lit(800L) + col("l_orderkey") % 4).as("id"),
        col("l_returnflag").as("main"),
        col("l_linestatus").as("description")).as("weather"),
      lit("stations").as("base"),
      struct(
        temp.as("temp"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) / 100.0 + 273.15).as("feels_like"),
        (lit(950L) + col("l_partkey") % 100).as("pressure"),
        (col("l_suppkey") % 101).as("humidity"),
        (temp * (lit(1.0) - col("l_discount"))).as("temp_min"),
        (temp * (lit(1.0) + col("l_tax"))).as("temp_max"),
        lit(null).cast("long").as("sea_level"),
        lit(null).cast("long").as("ground_level")).as("main"),
      (lit(10000L) - col("l_orderkey") % 3000).as("visibility"),
      struct(
        (col("l_quantity") / 10.0).as("speed"),
        (col("l_orderkey") % 360).as("degree"),
        when(col("l_linenumber") > 3, col("l_quantity") / 5.0).as("gust")).as("wind"),
      struct((col("l_orderkey") % 101).as("all")).as("clouds"),
      struct(
        when(col("l_returnflag") === "R", col("l_quantity") / 25.0).as("rain_1h"),
        when(col("l_returnflag") === "R", col("l_quantity") / 10.0).as("rain_3h")).as("rain"),
      struct(
        lit(null).cast("double").as("snow_1h"),
        lit(null).cast("double").as("snow_3h")).as("snow"),
      to_date(col("l_shipdate")).as("dt"),
      format_string("%02d:%02d:%02d",
        col("l_orderkey") % 24, col("l_linenumber") * 9 % 60, col("l_suppkey") % 60)
        .as("current_time"),
      struct(
        lit("IN").as("country"),
        (col("l_orderkey") % 86400).as("sunrise"),
        (col("l_orderkey") % 86400 + 43200).as("sunset")).as("sys"),
      lit(19800L).as("timezone"),
      lit("Bankura").as("name"))
  }
}
