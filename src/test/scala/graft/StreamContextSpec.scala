package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtQueries
import graft.streaming.StreamContext
import graft.streaming.StreamContext.Ev

/** Streaming context assembly == the x107 batch operator on the same
  * events, regardless of micro-batch boundaries (per-key in-order
  * arrival, the documented contract), plus bounded-state behavior on
  * a hand fixture.
  */
class StreamContextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hand fixture: pairs, ring truncation, cross-batch state carry") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamContext.contextPairs(input.toDS(), window = 2)
      .writeStream.format("memory").queryName("ctx_fix")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1L, 10L, "t1", "a"), Ev(1L, 11L, "t2", "b"))
      q.processAllAvailable()
      // state carries across the batch boundary: seq continues at 3,
      // the ring holds only the last 2 types
      input.addData(
        Ev(1L, 12L, "t3", "c"), Ev(1L, 13L, "t4", "d"))
      q.processAllAvailable()
      val got = spark.table("ctx_fix")
        .as[(Long, Long, Long, String, String)].collect().sortBy(_._2)
      assert(got === Array(
        (1L, 2L, 11L, "a", "b"),
        (1L, 3L, 12L, "a b", "c"),
        (1L, 4L, 13L, "b c", "d")))
    } finally q.stop()
  }

  test("stream == batch x107 on the real event log across 3 batches") {
    implicit val ctx = spark.sqlContext
    val evs = Tables(spark, dir, "events")
      .select($"user_id", $"event_id", $"ts".cast("string").as("ts"),
        $"event_type")
      .as[Ev].collect()
      .sortBy(e => (e.ts, e.event_id))  // global time order => per-key order
    val chunks = evs.grouped(math.max(1, evs.length / 3 + 1)).toSeq
    val input = MemoryStream[Ev]
    val q = StreamContext.contextPairs(input.toDS(), window = 4)
      .writeStream.format("memory").queryName("ctx_stream")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("ctx_stream")
        .as[(Long, Long, Long, String, String)].collect().toSet
      val batch = ExtQueries.queries("x107_context_windows")(spark, dir)
        .as[(Long, Long, Long, String, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
