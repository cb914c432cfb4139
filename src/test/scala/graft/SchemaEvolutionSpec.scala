package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DailyRollup
import graft.schema.WeatherSchema

/** Schema drift on the long-lived raw table: files written before a
  * column family existed (the raw store outlives any one writer
  * version) must stay readable, with the declared schema supplying
  * nulls for absent branches — the same null-skipping the reference
  * relies on for its usually-all-NULL rain columns (create sql:40-41).
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ndjson(dt: String, withRain: Boolean): String =
    s"""{"coord":{"lon":87.0,"lat":23.25},""" +
      s""""weather":[{"id":800,"main":"Clear","description":"sky"}],""" +
      s""""base":"stations",""" +
      s""""main":{"temp":300.15,"feels_like":301.0,"pressure":1000,""" +
      s""""humidity":50,"temp_min":299.0,"temp_max":302.0},""" +
      s""""clouds":{"all":40},""" +
      (if (withRain) s""""rain":{"rain_1h":1.5},""" else "") +
      s""""dt":"$dt","current_time":"10:00:00",""" +
      s""""sys":{"country":"IN"},"timezone":19800,"name":"B"}"""

  test("old files without the rain branch read as nulls under the declared schema") {
    val root = Files.createTempDirectory("evolve")
    val dir = root.resolve("raw").toString

    // v1 writer: no rain column anywhere in its files
    spark.read.schema(WeatherSchema.raw)
      .json(spark.createDataset(Seq(ndjson("2022-08-29", withRain = false)))(
        org.apache.spark.sql.Encoders.STRING))
      .drop("rain", "snow", "wind", "visibility")
      .write.parquet(dir)
    // v2 writer: full schema, same directory
    spark.read.schema(WeatherSchema.raw)
      .json(spark.createDataset(Seq(ndjson("2022-08-29", withRain = true)))(
        org.apache.spark.sql.Encoders.STRING))
      .write.mode("append").parquet(dir)

    // reading with the DECLARED schema (never inference) fills absent
    // branches with null — both files coexist
    val raw = spark.read.schema(WeatherSchema.raw).parquet(dir)
    assert(raw.count() === 2)
    assert(raw.filter(col("rain").isNull).count() === 1)

    // the rollup's null-skipping MAX sees only the v2 row's rain value
    val rolled = DailyRollup.rollup(raw).collect()
    assert(rolled.length === 1)
    val r = rolled.head
    assert(r.getAs[Double]("max_rain_1h") === 1.5)
    assert(r.getAs[Double]("avg_temp") === 27.0) // both rows aggregated
  }
}
