package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows
import graft.streaming.EventWindows.{Session, SessionEvent}

/** §2h event-time semantics: watermarked tumbling windows finalize in
  * append mode; gap sessions close on in-batch gaps and on event-time
  * timeout once the watermark passes.
  */
class EventWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("windowed stats: watermark finalizes closed windows in append mode") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventWindows.windowedStats(
      input.toDF().toDF("ts", "event_type", "value"),
      windowLen = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("winstats")
      .outputMode("append").start()
    try {
      input.addData((ts("10:05"), "click", 1.0), (ts("10:20"), "click", 2.0),
        (ts("10:40"), "view", 5.0))
      q.processAllAvailable()
      // watermark still inside the 10:00 window: nothing finalized
      assert(spark.table("winstats").count() == 0)
      // event at 12:00 → watermark 11:30 > 11:00 closes the 10:00 window
      input.addData((ts("12:00"), "click", 7.0))
      q.processAllAvailable()
      val out = spark.table("winstats")
        .select($"window_start".cast("string"), $"event_type", $"n", $"total_value")
        .as[(String, String, Long, Double)].collect().toSet
      assert(out == Set(
        ("2024-01-01 10:00:00", "click", 2L, 3.0),
        ("2024-01-01 10:00:00", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize: in-batch gap closes a session; timeout closes the rest") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = EventWindows.sessionize(input.toDS(), gapMs = 15 * 60 * 1000L,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart, then a 2-hour in-batch gap
      input.addData(
        SessionEvent(1L, ts("10:00"), 1.0), SessionEvent(1L, ts("10:05"), 2.0),
        SessionEvent(1L, ts("12:00"), 4.0))
      q.processAllAvailable()
      val first = spark.table("sessions").as[Session].collect()
      assert(first.toSeq == Seq(
        Session(1L, ts("10:00"), ts("10:05"), 2, 3.0))) // closed by in-batch gap
      // advance the watermark far past 12:00+gap → timeout closes the tail
      input.addData(SessionEvent(2L, ts("14:00"), 9.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts("14:01"), 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[Session].collect().toSet
      assert(all.contains(Session(1L, ts("12:00"), ts("12:00"), 1, 4.0)))
    } finally q.stop()
  }
}
