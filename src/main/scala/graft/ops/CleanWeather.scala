package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** P1 + P2 of SURVEY.md §2c: reshape a raw OpenWeather API response frame
  * (schema [[graft.schema.WeatherSchema.api]]) into the canonical nested
  * hourly record ([[graft.schema.WeatherSchema.raw]]).
  *
  * Semantics mirror /root/reference/Load-Data-From-API/main.py:79-143:
  *  - every absent parent branch yields a struct of NULL leaves (the
  *    reference builds `{"rain_1h": None, ...}` when `rain` is missing,
  *    not a NULL struct) — Spark's null-propagating nested-field access
  *    gives exactly this when we re-wrap leaves in `struct(...)`;
  *  - `weather` array → head element's fields, NULL when empty/absent
  *    (main.py:90-92) — `try_element_at` (NULL on out-of-bounds, ANSI-safe);
  *  - renames: `deg`→`degree`, `grnd_level`→`ground_level`, `1h`→`rain_1h`/
  *    `snow_1h`, `3h`→`rain_3h`/`snow_3h` (main.py:105,111,121-127);
  *  - `dt` + `current_time` are ingestion-time stamps injected by the
  *    caller (main.py:14-18,131-132 stamps Asia/Kolkata at invocation);
  *    they are parameters, not wall-clock reads, so batches are
  *    deterministic and replayable.
  *
  * Pure `select` — single narrow projection, no UDFs, no shuffle; at 100 TB
  * this stays embarrassingly parallel and fully inside whole-stage codegen.
  */
object CleanWeather {

  /** Ingestion-time stamps for one batch, in the reference's zone. */
  def kolkataStamps(utcMillis: Long): (Column, Column) = {
    val ts = from_utc_timestamp(timestamp_millis(lit(utcMillis)), "Asia/Kolkata")
    (to_date(ts), date_format(ts, "HH:mm:ss"))
  }

  def clean(api: DataFrame, dt: Column, currentTime: Column): DataFrame = {
    val w = try_element_at(col("weather"), lit(1))
    api.select(
      struct(
        col("coord.lon").as("longitude"),
        col("coord.lat").as("latitude")).as("coordinate"),
      struct(
        w.getField("id").as("id"),
        w.getField("main").as("main"),
        w.getField("description").as("description")).as("weather"),
      col("base"),
      struct(
        col("main.temp").as("temp"),
        col("main.feels_like").as("feels_like"),
        col("main.pressure").as("pressure"),
        col("main.humidity").as("humidity"),
        col("main.temp_min").as("temp_min"),
        col("main.temp_max").as("temp_max"),
        col("main.sea_level").as("sea_level"),
        col("main.grnd_level").as("ground_level")).as("main"),
      col("visibility"),
      struct(
        col("wind.speed").as("speed"),
        col("wind.deg").as("degree"),
        col("wind.gust").as("gust")).as("wind"),
      struct(col("clouds.all").as("all")).as("clouds"),
      struct(
        col("rain").getField("1h").as("rain_1h"),
        col("rain").getField("3h").as("rain_3h")).as("rain"),
      struct(
        col("snow").getField("1h").as("snow_1h"),
        col("snow").getField("3h").as("snow_3h")).as("snow"),
      dt.cast(DateType).as("dt"),
      currentTime.as("current_time"),
      struct(
        col("sys.country").as("country"),
        col("sys.sunrise").as("sunrise"),
        col("sys.sunset").as("sunset")).as("sys"),
      col("timezone"),
      col("name"))
  }
}
