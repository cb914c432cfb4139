package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

/** As-of join (ops/AsOfJoin): most-recent-at-or-before semantics,
  * same-timestamp inclusion, tie-breaks, and the no-prior-row null.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  // (key, time, id, value)
  private def frame(rows: Seq[(Long, Timestamp, Long, Double)]) =
    rows.toDF("user_id", "ts", "event_id", "value")

  private def attach(left: Seq[(Long, Timestamp, Long, Double)],
                     right: Seq[(Long, Timestamp, Long, Double)]) =
    AsOfJoin.asOf(frame(left), frame(right), key = "user_id", time = "ts",
        tiebreak = "event_id", payload = Seq("event_id", "value"))
      .select(col("event_id"), col("asof_event_id"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("each left row gets the latest right row at-or-before its time") {
    val got = attach(
      left = Seq((1L, ts(5), 100L, 9.0), (1L, ts(9), 101L, 9.0)),
      right = Seq((1L, ts(1), 11L, 1.0), (1L, ts(4), 12L, 2.0),
        (1L, ts(7), 13L, 3.0)))
    assert(got(100L) === ((Some(12L), Some(2.0))))
    assert(got(101L) === ((Some(13L), Some(3.0))))
  }

  test("a right row AT the left row's timestamp is included (at-or-before)") {
    val got = attach(
      left = Seq((1L, ts(5), 100L, 9.0)),
      right = Seq((1L, ts(5), 11L, 1.0)))
    assert(got(100L) === ((Some(11L), Some(1.0))))
  }

  test("no right row at-or-before yields nulls; keys never cross") {
    val got = attach(
      left = Seq((1L, ts(2), 100L, 9.0), (2L, ts(9), 200L, 9.0)),
      right = Seq((1L, ts(5), 11L, 1.0))) // after left's ts; other user
    assert(got(100L) === ((None, None)))
    assert(got(200L) === ((None, None)))
  }

  test("equal right timestamps break ties by the highest tiebreak id") {
    val got = attach(
      left = Seq((1L, ts(6), 100L, 9.0)),
      right = Seq((1L, ts(3), 12L, 2.0), (1L, ts(3), 11L, 1.0)))
    assert(got(100L) === ((Some(12L), Some(2.0))))
  }

  test("nullable payload columns come from the single latest right row") {
    // latest click has a null value: asof_value must be null, NOT
    // stitched from the older row that happened to have one
    val left = frame(Seq((1L, ts(9), 100L, 9.0)))
    val right = Seq(
      (1L, ts(2), 11L, Some(5.0)),
      (1L, ts(6), 12L, None: Option[Double]))
      .toDF("user_id", "ts", "event_id", "value")
    val got = AsOfJoin.asOf(left, right, key = "user_id", time = "ts",
        tiebreak = "event_id", payload = Seq("event_id", "value"))
      .select(col("asof_event_id"), col("asof_value"))
      .as[(Option[Long], Option[Double])].collect().head
    assert(got === ((Some(12L), None)))
  }

  test("every left row survives exactly once, even with zero right rows") {
    val out = AsOfJoin.asOf(
      frame(Seq((1L, ts(1), 100L, 9.0), (1L, ts(2), 101L, 9.0))),
      frame(Seq.empty), key = "user_id", time = "ts",
      tiebreak = "event_id", payload = Seq("value"))
    assert(out.count() === 2)
    assert(out.columns.toSet ===
      Set("user_id", "ts", "event_id", "value", "asof_value"))
  }
}
