package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DailyRollup
import graft.schema.WeatherSchema

/** Streaming incremental rollup (§2h): the watermarked 1-day windowed
  * aggregation must emit, per closed day, EXACTLY the batch rollup's
  * row — the two paths share the aggregate expressions, and this spec
  * pins that they stay shared.
  */
class StreamRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ndjson(dt: String, time: String, temp: Double, pressure: Long): String =
    s"""{"coord":{"lon":87.0,"lat":23.25},""" +
      s""""weather":[{"id":800,"main":"Clear","description":"clear sky"}],""" +
      s""""base":"stations",""" +
      s""""main":{"temp":$temp,"feels_like":${temp + 1},"pressure":$pressure,""" +
      s""""humidity":50,"temp_min":${temp - 1},"temp_max":${temp + 2}},""" +
      s""""visibility":10000,"wind":{"speed":3.0,"deg":120},"clouds":{"all":40},""" +
      s""""dt":"$dt","current_time":"$time",""" +
      s""""sys":{"country":"IN","sunrise":1,"sunset":2},"timezone":19800,"name":"B"}"""

  test("closed-day streaming rollup equals the batch rollup row for row") {
    implicit val ctx = spark.sqlContext
    val lines = Seq(
      ndjson("2022-08-29", "10:00:00", 300.15, 1000L),
      ndjson("2022-08-29", "23:30:00", 304.15, 1004L), // EOD: > 23:00:00
      ndjson("2022-08-30", "09:00:00", 280.15, 996L))
    val closer = ndjson("2022-09-05", "00:00:00", 290.15, 1000L)

    def parse(df: org.apache.spark.sql.DataFrame) = df
      .select(from_json(col("value"), WeatherSchema.raw).as("r"))
      .select("r.*")

    val input = MemoryStream[String]
    val q = DailyRollup.rollupStream(parse(input.toDF()), lateness = "1 hour")
      .writeStream.format("memory").queryName("roll_stream")
      .outputMode("append").start()
    try {
      input.addData(lines.take(2))
      q.processAllAvailable()
      input.addData(lines.drop(2))
      q.processAllAvailable()
      input.addData(closer) // watermark passes both days' window ends
      q.processAllAvailable()

      val streamed = spark.table("roll_stream")
        .filter(col("dt") < "2022-09-01")
      val batch = DailyRollup.rollup(
        parse(spark.createDataset(lines).toDF()))

      assert(streamed.count() === 2)
      assert(streamed.columns.toSeq === batch.columns.toSeq)
      val s = streamed.orderBy("dt").collect().toSeq
      val b = batch.orderBy("dt").collect().toSeq
      assert(s === b)
      // the EOD CASE fired on the day whose max time is past 23:00:00
      val till = streamed.select(col("dt").cast("string"), col("till_time"))
        .as[(String, String)].collect().toMap
      assert(till === Map("2022-08-29" -> "EOD", "2022-08-30" -> "09:00:00"))
    } finally q.stop()
  }

  test("malformed event-time rows are dropped AND counted per batch") {
    implicit val ctx = spark.sqlContext

    def parse(df: org.apache.spark.sql.DataFrame) = df
      .select(from_json(col("value"), WeatherSchema.raw).as("r"))
      .select("r.*")

    val input = MemoryStream[String]
    val q = DailyRollup.rollupStream(parse(input.toDF()), lateness = "1 hour")
      .writeStream.format("memory").queryName("roll_malformed")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        ndjson("2022-08-29", "10:00:00", 300.15, 1000L),
        ndjson("2022-08-29", "not-a-time", 500.0, 9999L), // unparseable
        ndjson("2022-08-29", "11:00:00", 302.15, 1001L)))
      q.processAllAvailable()
      input.addData(ndjson("2022-09-05", "00:00:00", 290.15, 1000L))
      q.processAllAvailable()

      // the drop is observable: every micro-batch reports the
      // conditional-aggregate counts through observedMetrics
      import scala.jdk.CollectionConverters._
      val observed = q.recentProgress.toSeq
        .flatMap(p => p.observedMetrics.asScala.get("rollup_stream"))
      val malformed = observed.map(_.getAs[Long]("malformed_rows")).sum
      val inputRows = observed.map(_.getAs[Long]("input_rows")).sum
      assert(malformed === 1)
      assert(inputRows === 4)

      // and the malformed row truly did not poison the aggregate: the
      // day's rollup reflects only the two parseable rows
      val row = spark.table("roll_malformed")
        .filter(col("dt") === "2022-08-29")
        .select("max_temp", "max_pressure").collect()
      assert(row.length === 1)
      assert(row(0).getDouble(0) === 31.0) // max(temp_max)=304.15 K → C
      assert(row(0).getDouble(1) === 1001.0)
    } finally q.stop()
  }
}
