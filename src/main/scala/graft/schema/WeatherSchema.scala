package graft.schema

import org.apache.spark.sql.types._

/** Schemas mirroring the reference's data model.
  *
  * Raw hourly table: /root/reference/schema.json:1-208 (BigQuery RECORD/
  * FLOAT/INTEGER/STRING/DATE → StructType/DoubleType/LongType/StringType/
  * DateType; every field nullable, as in BQ).
  *
  * Daily rollup table: /root/reference/Load-gcs-to-bq/
  * sp_raw_to_transformed_create_weather_data_query.sql:3-21 (all aggregate
  * columns FLOAT64 — BigQuery coerces the INT64 max/min pressure etc. to
  * FLOAT64 on insert, so we declare DoubleType throughout).
  */
object WeatherSchema {
  private def st(fields: StructField*) = StructType(fields.toSeq)
  private def f(name: String, t: DataType) = StructField(name, t, nullable = true)

  /** Canonical raw hourly record (post-clean), one row per hourly fetch. */
  val raw: StructType = st(
    f("coordinate", st(f("longitude", DoubleType), f("latitude", DoubleType))),
    f("weather", st(f("id", LongType), f("main", StringType), f("description", StringType))),
    f("base", StringType),
    f("main", st(
      f("temp", DoubleType), f("feels_like", DoubleType),
      f("pressure", LongType), f("humidity", LongType),
      f("temp_min", DoubleType), f("temp_max", DoubleType),
      f("sea_level", LongType), f("ground_level", LongType))),
    f("visibility", LongType),
    f("wind", st(f("speed", DoubleType), f("degree", LongType), f("gust", DoubleType))),
    f("clouds", st(f("all", LongType))),
    f("rain", st(f("rain_1h", DoubleType), f("rain_3h", DoubleType))),
    f("snow", st(f("snow_1h", DoubleType), f("snow_3h", DoubleType))),
    f("dt", DateType),
    f("current_time", StringType), // "HH:MM:SS"; lexicographic order is load-bearing
    f("sys", st(f("country", StringType), f("sunrise", LongType), f("sunset", LongType))),
    f("timezone", LongType),
    f("name", StringType))

  /** OpenWeather current-weather API response shape (pre-clean input),
    * exactly the fields consumed by the reference's clean step
    * (/root/reference/Load-Data-From-API/main.py:79-143). Note `weather`
    * is an ARRAY here (head taken during clean), and the raw API names
    * `deg`, `grnd_level`, `1h`, `3h` that clean renames.
    */
  val api: StructType = st(
    f("coord", st(f("lon", DoubleType), f("lat", DoubleType))),
    f("weather", ArrayType(
      st(f("id", LongType), f("main", StringType), f("description", StringType)),
      containsNull = true)),
    f("base", StringType),
    f("main", st(
      f("temp", DoubleType), f("feels_like", DoubleType),
      f("pressure", LongType), f("humidity", LongType),
      f("temp_min", DoubleType), f("temp_max", DoubleType),
      f("sea_level", LongType), f("grnd_level", LongType))),
    f("visibility", LongType),
    f("wind", st(f("speed", DoubleType), f("deg", LongType), f("gust", DoubleType))),
    f("clouds", st(f("all", LongType))),
    f("rain", st(f("1h", DoubleType), f("3h", DoubleType))),
    f("snow", st(f("1h", DoubleType), f("3h", DoubleType))),
    f("sys", st(f("country", StringType), f("sunrise", LongType), f("sunset", LongType))),
    f("timezone", LongType),
    f("name", StringType))

  /** Daily rollup output schema (create sql:3-21), plus the month-truncated
    * partition column appended at write time by [[graft.ops.DailyTable]].
    */
  val daily: StructType = st(
    f("avg_temp", DoubleType), f("max_temp", DoubleType), f("min_temp", DoubleType),
    f("feels_like", DoubleType),
    f("avg_pressure", DoubleType), f("max_pressure", DoubleType), f("min_pressure", DoubleType),
    f("avg_humidity", DoubleType), f("max_humidity", DoubleType), f("min_humidity", DoubleType),
    f("avg_cloud_coverage", DoubleType), f("max_cloud_coverage", DoubleType),
    f("min_cloud_coverage", DoubleType),
    f("max_rain_1h", DoubleType), f("max_rain_3h", DoubleType),
    f("dt", DateType),
    f("month", IntegerType),
    f("till_time", StringType))

  /** Log-event envelope (§2j of SURVEY.md; field set of MESSAGE_DATA at
    * /root/reference/Load-Data-From-API/main.py:32-38,192-195 and
    * /root/reference/Load-gcs-to-bq/main.py:27-33,96-99).
    */
  val logEvent: StructType = st(
    f("project", StringType), f("service", StringType), f("process", StringType),
    f("runtime", StringType), f("log_type", StringType),
    f("file_name", StringType), f("gcs_uri", StringType), f("bq_uri", StringType),
    f("message_type", StringType), f("message", StringType))
}
