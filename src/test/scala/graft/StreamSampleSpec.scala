package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Sampling, TopK}
import graft.streaming.StreamSample

/** Streaming A-ES weighted sampling: the closed-window reservoir must
  * equal the batch top-k of the same rows regardless of micro-batch
  * boundaries, heavier rows must win proportionally often, and the
  * sample must be a deterministic function of the data (replay-stable).
  */
class StreamSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("closed window sample == batch A-ES top-k of the union") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long)]
    val q = StreamSample.windowedSample(
      input.toDF().toDF("ts", "id", "w"),
      "ts", "id", "w", windowLength = "1 hour", watermark = "30 minutes",
      k = 5)
      .writeStream.format("memory").queryName("sample_out")
      .outputMode("append").start()
    // 30 unique ids, id i has weight 10*i + 1 (strictly increasing)
    val rows = (1L to 30L).map(i => (i, 10 * i + 1))
    val (b1, b2) = rows.splitAt(13)
    try {
      input.addData(b1.map { case (i, w) => (ts("10:05"), i, w) })
      q.processAllAvailable()
      input.addData(b2.map { case (i, w) => (ts("10:40"), i, w) })
      q.processAllAvailable()
      input.addData(Seq((ts("13:00"), 999L, 1L))) // close the 10:00 window
      q.processAllAvailable()
      val got = spark.table("sample_out")
        .filter($"window_start" === ts("10:00"))
        .select($"rnk", $"sampled_id", $"key12")
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      assert(got.length === 5)
      // batch recompute with the same column arithmetic
      val expect = rows.toDF("id", "w")
        .agg(TopK.topK(5)(Sampling.esKey(col("id"), col("w")), col("id"))
          .as("s"))
        .select(posexplode(col("s")).as(Seq("i", "s")))
        .select((col("i") + 1).cast("long"), col("s.id"), col("s.score"))
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      assert(got.toSeq === expect.toSeq)
      // ranks strictly ordered by (key desc, id asc)
      got.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
        case _ =>
      }
    } finally q.stop()
  }

  test("weighting bias: heavy ids dominate the sample") {
    // ids 1..100; ids > 90 carry 100x the weight of the rest — a
    // 5-slot A-ES sample should be mostly (deterministically, given
    // the fixed md5 keys) heavy ids
    val rows = (1L to 100L).map(i => (i, if (i > 90) 10000L else 100L))
    val sample = rows.toDF("id", "w")
      .agg(TopK.topK(5)(Sampling.esKey(col("id"), col("w")), col("id"))
        .as("s"))
      .select(explode(col("s.id")).as("id")).as[Long].collect()
    assert(sample.count(_ > 90) >= 3,
      s"expected mostly heavy ids, got ${sample.toSeq}")
  }

  test("null id or weight rows are skipped, not a crash (r10 advice)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, java.lang.Long, java.lang.Long)]
    val q = StreamSample.windowedSample(
      input.toDF().toDF("ts", "id", "w"),
      "ts", "id", "w", windowLength = "1 hour", watermark = "30 minutes",
      k = 5)
      .writeStream.format("memory").queryName("sample_nulls")
      .outputMode("append").start()
    try {
      input.addData(Seq[(Timestamp, java.lang.Long, java.lang.Long)](
        (ts("10:00"), 1L, 11L), (ts("10:05"), null, 21L),
        (ts("10:10"), 3L, null), (ts("10:15"), 4L, 41L)))
      q.processAllAvailable()
      input.addData(Seq[(Timestamp, java.lang.Long, java.lang.Long)](
        (ts("13:00"), 9L, 91L)))
      q.processAllAvailable()
      val sampled = spark.table("sample_nulls")
        .select($"window_start", $"sampled_id")
        .as[(Timestamp, Long)].collect()
        .filter(_._1 == ts("10:00")).map(_._2).toSet
      assert(sampled === Set(1L, 4L),
        "exactly the rows with non-null (id, weight) participate")
    } finally q.stop()
  }
}
