package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CleanWeather, DailyRollup, Retention}
import graft.schema.WeatherSchema

class WeatherPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- CleanWeather (P1/P2): null guards of main.py:79-143 ----

  private val apiFixtures = Seq(
    // fully populated
    """{"coord":{"lon":87.0,"lat":23.25},
       "weather":[{"id":501,"main":"Rain","description":"moderate rain"}],
       "base":"stations",
       "main":{"temp":300.15,"feels_like":303.0,"pressure":1006,"humidity":83,
               "temp_min":299.0,"temp_max":301.0,"sea_level":1006,"grnd_level":1002},
       "visibility":10000,
       "wind":{"speed":4.1,"deg":80,"gust":6.7},
       "clouds":{"all":75},
       "rain":{"1h":2.73,"3h":5.1},
       "snow":{"1h":0.5,"3h":1.0},
       "sys":{"country":"IN","sunrise":1661834187,"sunset":1661882248},
       "timezone":19800,"name":"Bankura"}""".replaceAll("\n\\s*", ""),
    // absent branches: no rain/snow/wind.gust/sea levels (main.py null guards)
    """{"coord":{"lon":87.0,"lat":23.25},
       "weather":[{"id":800,"main":"Clear","description":"clear sky"}],
       "base":"stations",
       "main":{"temp":280.15,"feels_like":279.0,"pressure":1010,"humidity":40,
               "temp_min":279.0,"temp_max":281.0},
       "visibility":10000,
       "wind":{"speed":2.0,"deg":10},
       "clouds":{"all":0},
       "sys":{"country":"IN","sunrise":1661834187,"sunset":1661882248},
       "timezone":19800,"name":"Bankura"}""".replaceAll("\n\\s*", ""),
    // empty weather array + missing coord (main.py:85-92 falsy guards)
    """{"weather":[],"base":"stations",
       "main":{"temp":290.15,"feels_like":289.0,"pressure":1008,"humidity":60,
               "temp_min":289.0,"temp_max":291.0},
       "timezone":19800,"name":"Bankura"}""".replaceAll("\n\\s*", ""),
  )

  private lazy val cleaned = CleanWeather.clean(
    spark.read.schema(WeatherSchema.api).json(apiFixtures.toDS()),
    lit("2022-08-30"), lit("14:30:00"))

  test("clean emits the canonical raw schema") {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(cleaned.schema) == shape(WeatherSchema.raw))
  }

  test("clean: full row carries values and renames through") {
    val r = cleaned.filter($"main.temp" === 300.15).select(
      $"coordinate.longitude", $"weather.main", $"main.ground_level",
      $"wind.degree", $"rain.rain_1h", $"dt", $"current_time").head()
    assert(r.getDouble(0) == 87.0)
    assert(r.getString(1) == "Rain")
    assert(r.getLong(2) == 1002L)
    assert(r.getLong(3) == 80L)
    assert(r.getDouble(4) == 2.73)
    assert(r.getDate(5) == Date.valueOf("2022-08-30"))
    assert(r.getString(6) == "14:30:00")
  }

  test("clean: absent branches become null leaves (not errors)") {
    val r = cleaned.filter($"main.temp" === 280.15).select(
      $"rain.rain_1h", $"snow.snow_1h", $"wind.gust", $"main.sea_level").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("clean: empty weather array and missing coord → null fields") {
    val r = cleaned.filter($"main.temp" === 290.15).select(
      $"weather.id", $"weather.main", $"coordinate.longitude").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  // ---- DailyRollup (A1-A6, P8-P11, W1) ----

  private def hourlyRow(dt: String, time: String, temp: Double, tMin: Double,
      tMax: Double, press: Long, hum: Long, clouds: Long,
      rain1h: Any = null, rain3h: Any = null): Row =
    Row(
      Row(87.0, 23.25), Row(800L, "Clear", "clear sky"), "stations",
      Row(temp, temp + 1.0, press, hum, tMin, tMax, null, null),
      10000L, Row(3.0, 120L, null), Row(clouds),
      Row(rain1h, rain3h), Row(null, null),
      Date.valueOf(dt), time, Row("IN", 1L, 2L), 19800L, "Bankura")

  private lazy val rollup = DailyRollup.rollup(
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        hourlyRow("2022-08-29", "22:15:00", 300.15, 299.15, 301.15, 1000L, 80L, 50L),
        hourlyRow("2022-08-29", "23:00:00", 290.15, 289.15, 291.15, 1010L, 60L, 70L),
        hourlyRow("2022-08-30", "23:00:01", 280.15, 279.15, 281.15, 1005L, 40L, 10L,
          rain1h = 1.5, rain3h = 3.0),
      )), WeatherSchema.raw))

  test("rollup: aggregate semantics of create sql:24-55") {
    val rows = rollup.collect()
    assert(rows.map(_.getAs[Date]("dt")).toSeq ==
      Seq(Date.valueOf("2022-08-29"), Date.valueOf("2022-08-30")))
    val d1 = rows(0)
    assert(d1.getAs[Double]("avg_temp") == 22.0)       // avg(300.15,290.15)-273.15
    assert(d1.getAs[Double]("max_temp") == 28.0)       // max temp_max - 273.15
    assert(d1.getAs[Double]("min_temp") == 16.0)       // min temp_min - 273.15
    assert(d1.getAs[Double]("avg_pressure") == 1005.0) // round(avg(1000,1010))
    assert(d1.getAs[Double]("max_humidity") == 80.0)
    assert(d1.getAs[Int]("month") == 8)
    assert(d1.isNullAt(d1.fieldIndex("max_rain_1h")))  // all-NULL group → NULL
  }

  test("rollup: strict-> EOD boundary on lexicographic time strings") {
    val byDt = rollup.collect().map(r => r.getAs[Date]("dt").toString ->
      r.getAs[String]("till_time")).toMap
    assert(byDt("2022-08-29") == "23:00:00") // exactly 23:00:00 is NOT EOD
    assert(byDt("2022-08-30") == "EOD")      // 23:00:01 > '23:00:00'
  }

  test("rollup: incremental scope restricts to one day") {
    val one = DailyRollup.rollup(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          hourlyRow("2022-08-29", "10:00:00", 300.15, 299.15, 301.15, 1000L, 80L, 50L),
          hourlyRow("2022-08-30", "11:00:00", 280.15, 279.15, 281.15, 1005L, 40L, 10L),
        )), WeatherSchema.raw),
      Some(Date.valueOf("2022-08-30")))
    assert(one.select($"dt").as[Date].collect().toSeq ==
      Seq(Date.valueOf("2022-08-30")))
  }

  // ---- Retention (K5): inclusive delete boundary ----

  test("retention keeps strictly dt > asOf - 15") {
    val df = Seq("2024-01-15", "2024-01-16", "2024-01-17")
      .map(Date.valueOf).toDF("dt")
    val kept = Retention.keep(df, lit(Date.valueOf("2024-01-31")))
      .select($"dt").as[Date].collect().toSeq
    assert(kept == Seq(Date.valueOf("2024-01-17"))) // 16th = asOf-15 → deleted
  }

  test("retention partition drop removes only expired dt= directories") {
    val root = java.nio.file.Files.createTempDirectory("graft-ret").toString + "/raw"
    Seq("2024-01-15", "2024-01-16", "2024-01-17", "2024-01-20")
      .map(Date.valueOf).toDF("dt")
      .withColumn("v", lit(1L))
      .write.partitionBy("dt").parquet(root)
    val dropped = Retention.dropExpiredPartitions(
      spark, root, Date.valueOf("2024-01-31"))
    // boundary matches the relational form: 16th (= asOf-15) expires too
    assert(dropped.sorted == Seq("dt=2024-01-15", "dt=2024-01-16"))
    val left = spark.read.parquet(root).select($"dt".cast("string"))
      .as[String].collect().toSet
    assert(left == Set("2024-01-17", "2024-01-20")) // no data rewritten
  }
}
