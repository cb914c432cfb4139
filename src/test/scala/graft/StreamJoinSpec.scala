package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream attribution join: outcomes attach to the trigger they
  * follow within the bound; outside-the-window outcomes never match.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("outcomes join their trigger only within the delay bound") {
    implicit val ctx = spark.sqlContext
    val triggers = MemoryStream[(Timestamp, Long, String)]
    val outcomes = MemoryStream[(Timestamp, Long, String)]
    val joined = StreamJoin.within(
      triggers.toDF().toDF("t_ts", "t_user", "t_id"),
      outcomes.toDF().toDF("o_ts", "o_user", "o_id"),
      primaryKey = "t_user", secondaryKey = "o_user",
      primaryTs = "t_ts", secondaryTs = "o_ts",
      maxDelay = "10 minutes", watermark = "30 minutes")
    val q = joined
      .selectExpr("t_id", "o_id")
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      triggers.addData(
        (ts("10:00"), 1L, "imp1"),
        (ts("10:00"), 2L, "imp2"),
        (ts("11:00"), 1L, "imp3"))
      outcomes.addData(
        (ts("10:05"), 1L, "click-in-window"),      // 5 min after imp1
        (ts("10:30"), 2L, "click-too-late"),        // 30 min after imp2
        (ts("11:01"), 1L, "click-for-imp3"),        // 1 min after imp3
        (ts("10:59"), 1L, "click-before-imp3"))     // before imp3, >10m after imp1
      q.processAllAvailable()
      val got = spark.table("attributed")
        .as[(String, String)].collect().toSet
      assert(got == Set(
        ("imp1", "click-in-window"),
        ("imp3", "click-for-imp3")), s"got $got")
    } finally q.stop()
  }

  test("stream-static enrichment: dim attaches per batch, misses pass through") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("dim_user", "tier")
    val events = MemoryStream[(Timestamp, Long, String)]
    val q = StreamJoin.enrich(
      events.toDF().toDF("ts", "user", "ev"), dim,
      streamKey = "user", dimKey = "dim_user")
      .selectExpr("ev", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      events.addData((ts("10:00"), 1L, "a"), (ts("10:01"), 3L, "b"))
      q.processAllAvailable()
      events.addData((ts("10:02"), 2L, "c"))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .as[(String, Option[String])].collect().toSet
      assert(got == Set(
        ("a", Some("gold")),
        ("b", None), // unmatched stream row survives with null tier
        ("c", Some("silver"))), s"got $got")
    } finally q.stop()
  }
}
