package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDq

/** Streaming DQ monitor: violation counters accumulate across
  * micro-batches within a window and each closed window emits one row
  * per check.
  */
class StreamDqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("per-window violation counts merge across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, java.lang.Double, String)]
    val q = StreamDq.windowedChecks(
      input.toDF().toDF("ts", "value", "kind"),
      "ts", windowLength = "1 hour", watermark = "30 minutes",
      checks = Seq(
        "null_value" -> col("value").isNull,
        "negative_value" -> (col("value") < 0),
        "unknown_kind" -> !col("kind").isin("a", "b")))
      .writeStream.format("memory").queryName("dq_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("10:00"), 1.0, "a"), (ts("10:05"), null, "b"),
        (ts("10:10"), -2.0, "a"))
      q.processAllAvailable()
      input.addData(
        (ts("10:30"), 3.0, "zz"), (ts("10:40"), null, "a"))
      q.processAllAvailable()
      input.addData((ts("13:00"), java.lang.Double.valueOf(0.0), "a")) // close the 10:00 window
      q.processAllAvailable()

      val closed = spark.table("dq_out")
        .filter($"window_start" === ts("10:00"))
        .select($"check_name", $"n_rows", $"n_violations")
        .as[(String, Long, Long)].collect().sortBy(_._1)
      assert(closed.toSeq == Seq(
        ("negative_value", 5L, 1L),
        ("null_value", 5L, 2L),
        ("unknown_kind", 5L, 1L)))
    } finally q.stop()
  }
}
