package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamKmv

/** Streaming KMV distinct estimation: sketches merge across
  * micro-batches (the state store calls the Aggregator's merge), dups
  * never inflate the count, and with fewer distincts than k the
  * estimate is exact — making the assertion deterministic.
  */
class StreamKmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("per-window distinct estimate merges across batches, exact below k") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamKmv.windowedDistinct(
      input.toDF().toDF("ts", "user"),
      "ts", "user", windowLength = "1 hour", watermark = "30 minutes",
      k = 64)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("append").start()
    try {
      // window 10:00-11:00 — batch 1: 3 distinct users, one duplicated
      input.addData(
        (ts("10:00"), "ada"), (ts("10:05"), "bob"),
        (ts("10:10"), "ada"), (ts("10:20"), "cyd"))
      q.processAllAvailable()
      // batch 2: same window — 1 repeat (must not inflate) + 2 new
      input.addData(
        (ts("10:30"), "bob"), (ts("10:40"), "dee"), (ts("10:50"), "eli"))
      q.processAllAvailable()
      // batch 3: far-future row closes the 10:00 window past the watermark
      input.addData((ts("13:00"), "zoe"))
      q.processAllAvailable()
      val closed = spark.table("kmv_out")
        .select($"window_start", $"sketch_size", $"distinct_est")
        .as[(Timestamp, Long, Double)].collect()
        .filter(_._1 == ts("10:00"))
      assert(closed.length === 1,
        s"one emission for the closed window, got ${closed.toSeq}")
      // 5 distinct users (< k = 64) → sketch not full → estimate exact
      assert(closed.head._2 === 5L)
      assert(closed.head._3 === 5.0)
    } finally q.stop()
  }

  test("extra keys group by NAME and survive the post-agg select") {
    // extraKeys are column names (not expressions) precisely so the
    // same reference resolves in both the groupBy and the final
    // select against the aggregated schema
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val q = StreamKmv.windowedDistinct(
      input.toDF().toDF("ts", "user", "site"),
      "ts", "user", windowLength = "1 hour", watermark = "30 minutes",
      k = 64, "site")
      .writeStream.format("memory").queryName("kmv_keyed")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("10:00"), "ada", "eu"), (ts("10:05"), "bob", "eu"),
        (ts("10:10"), "ada", "us"))
      q.processAllAvailable()
      input.addData((ts("13:00"), "zoe", "eu")) // close the 10:00 window
      q.processAllAvailable()
      val closed = spark.table("kmv_keyed")
        .select($"window_start", $"site", $"distinct_est")
        .as[(Timestamp, String, Double)].collect()
        .filter(_._1 == ts("10:00")).sortBy(_._2)
      assert(closed.toSeq === Seq(
        (ts("10:00"), "eu", 2.0), (ts("10:00"), "us", 1.0)))
    } finally q.stop()
  }
}
