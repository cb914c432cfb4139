package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Hll
import graft.streaming.StreamHll

/** Streaming HLL distinct estimation: the streamed per-window sketch
  * must equal a batch recompute of the same registers over the union
  * of all batches (elementwise-max merge is batch-boundary invariant),
  * and replayed duplicates must not move a single register.
  */
class StreamHllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  /** Batch-side (v_zero, s_int, estimate) for a value set, via the
    * same Hll helpers the stream uses.
    */
  private def batchSketch(values: Seq[String]): (Long, Long, Double) =
    values.toDF("v")
      .agg(Hll.hll(Hll.h32(col("v"))).as("regs"))
      .select(Hll.zeroCount(col("regs")).as("vz"),
        Hll.registerSum("regs").as("si"))
      .withColumn("est", Hll.estimate(col("si"), col("vz")))
      .as[(Long, Long, Double)].head()

  test("stream == batch across micro-batch boundaries; dups are free") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamHll.windowedDistinct(
      input.toDF().toDF("ts", "user"),
      "ts", "user", windowLength = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("append").start()
    val batch1 = Seq("ada", "bob", "ada", "cyd")
    val batch2 = Seq("bob", "dee", "eli", "eli")
    try {
      input.addData(batch1.map(u => (ts("10:00"), u)))
      q.processAllAvailable()
      input.addData(batch2.map(u => (ts("10:40"), u)))
      q.processAllAvailable()
      input.addData(Seq((ts("13:00"), "zoe"))) // close 10:00 past watermark
      q.processAllAvailable()
      val closed = spark.table("hll_out")
        .select($"window_start", $"v_zero", $"s_int", $"distinct_est")
        .as[(Timestamp, Long, Long, Double)].collect()
        .filter(_._1 == ts("10:00"))
      assert(closed.length === 1,
        s"one emission for the closed window, got ${closed.toSeq}")
      val (vz, si, est) = batchSketch(batch1 ++ batch2)
      assert((closed.head._2, closed.head._3, closed.head._4) ===
        ((vz, si, est)),
        "streamed sketch must equal the batch sketch of the union")
      // 5 distinct users: the small-range linear-counting branch
      assert(est > 0.0 && math.abs(est - 5.0) <= 2.0)
      // duplicate-idempotence at the sketch level: registers of the
      // deduplicated value set are identical
      val (vzD, siD, estD) = batchSketch((batch1 ++ batch2).distinct)
      assert((vzD, siD, estD) === ((vz, si, est)))
    } finally q.stop()
  }

  test("keyed windows estimate independently per key") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val q = StreamHll.windowedDistinct(
      input.toDF().toDF("ts", "user", "site"),
      "ts", "user", windowLength = "1 hour", watermark = "30 minutes",
      "site")
      .writeStream.format("memory").queryName("hll_keyed")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (ts("10:00"), "ada", "eu"), (ts("10:05"), "bob", "eu"),
        (ts("10:10"), "ada", "us")))
      q.processAllAvailable()
      input.addData(Seq((ts("13:00"), "zoe", "eu")))
      q.processAllAvailable()
      val closed = spark.table("hll_keyed")
        .select($"window_start", $"site", $"v_zero", $"s_int",
          $"distinct_est")
        .as[(Timestamp, String, Long, Long, Double)].collect()
        .filter(_._1 == ts("10:00")).sortBy(_._2)
      assert(closed.map(_._2).toSeq === Seq("eu", "us"))
      val eu = batchSketch(Seq("ada", "bob"))
      val us = batchSketch(Seq("ada"))
      assert((closed(0)._3, closed(0)._4, closed(0)._5) === ((eu._1, eu._2, eu._3)))
      assert((closed(1)._3, closed(1)._4, closed(1)._5) === ((us._1, us._2, us._3)))
    } finally q.stop()
  }

  test("null values are skipped, not a crash (r10 advice)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamHll.windowedDistinct(
      input.toDF().toDF("ts", "user"),
      "ts", "user", windowLength = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("hll_nulls")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts("10:00"), "ada"), (ts("10:05"), null),
        (ts("10:10"), "bob")))
      q.processAllAvailable()
      input.addData(Seq((ts("13:00"), "zoe")))
      q.processAllAvailable()
      val closed = spark.table("hll_nulls")
        .select($"window_start", $"v_zero", $"s_int", $"distinct_est")
        .as[(Timestamp, Long, Long, Double)].collect()
        .filter(_._1 == ts("10:00"))
      assert(closed.length === 1)
      val (vz, si, est) = batchSketch(Seq("ada", "bob"))
      assert((closed.head._2, closed.head._3, closed.head._4) ===
        ((vz, si, est)),
        "sketch must equal the batch sketch of the non-null values")
    } finally q.stop()
  }
}
