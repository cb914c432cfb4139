package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Ingest-time dedup (§2h × §2k): first occurrence passes through,
  * in-window duplicates are dropped across micro-batches, and state
  * expiry re-admits only duplicates arriving past the watermark.
  */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("cross-batch duplicates within the watermark are dropped once") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = StreamDedup.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"),
      "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: an in-batch duplicate pair + a unique doc
      input.addData(
        (ts("10:00"), 1L, "alpha doc"),
        (ts("10:01"), 2L, "alpha doc"),
        (ts("10:02"), 3L, "beta doc"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate (inside the window) + a new doc
      input.addData(
        (ts("10:10"), 4L, "alpha doc"),
        (ts("10:11"), 5L, "gamma doc"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out")
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 5L), s"got $kept")
    } finally q.stop()
  }

  test("state expiry re-admits a duplicate arriving past the watermark window") {
    // the documented bounded-state trade-off: once the key's state has
    // expired (watermark moved past it), a fresh in-time duplicate is
    // admitted again — late-window dups are the batch dedup's job
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = StreamDedup.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"),
      "text", "ts", watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup_expiry")
      .outputMode("append").start()
    try {
      input.addData((ts("10:00"), 1L, "alpha doc"))
      q.processAllAvailable()
      // push the watermark far past 10:00 + 30min
      input.addData((ts("12:30"), 2L, "beta doc"))
      q.processAllAvailable()
      // same content, fresh event time, original state expired
      input.addData((ts("12:40"), 3L, "alpha doc"))
      q.processAllAvailable()
      val kept = spark.table("dedup_expiry")
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L), s"got $kept")
    } finally q.stop()
  }

  test("normalized variant collapses case/whitespace duplicates") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = StreamDedup.dedupStreamNormalized(
      input.toDF().toDF("ts", "doc_id", "text"),
      "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_norm_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("09:00"), 1L, "Same   Doc"),
        (ts("09:01"), 2L, "same doc "),
        (ts("09:02"), 3L, "different"))
      q.processAllAvailable()
      val kept = spark.table("dedup_norm_out")
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L), s"got $kept")
    } finally q.stop()
  }
}
