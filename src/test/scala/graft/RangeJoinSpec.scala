package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val intervals = Seq(
    // (interval_id, lo, hi)
    (1L, 100L, 199L),
    (2L, 150L, 250L), // overlaps interval 1
    (3L, 900L, 900L)  // degenerate single-point interval
  ).toDF("interval_id", "lo", "hi")

  private val points = Seq(
    (10L, 100L), // lo-inclusive edge of 1
    (11L, 199L), // hi-inclusive edge of 1, inside 2
    (12L, 175L), // inside both 1 and 2
    (13L, 250L), // hi edge of 2
    (14L, 251L), // just outside everything
    (15L, 900L), // the degenerate interval
    (16L, 50L)   // before everything
  ).toDF("point_id", "pt")

  private def matches(bucketWidth: Long): Set[(Long, Long)] =
    RangeJoin.byBucket(points, "pt", intervals, "lo", "hi", bucketWidth)
      .select($"point_id", $"interval_id").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (10L, 1L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
    (13L, 2L), (15L, 3L))

  test("matches exactly the inclusive-range pairs, each pair once") {
    assert(matches(bucketWidth = 100L) === expected)
  }

  test("result is invariant to the bucket width") {
    // width smaller than intervals (high replication), width larger
    // than the whole domain (single bucket), and a non-divisor width
    for (w <- Seq(7L, 100000L, 33L)) assert(matches(w) === expected)
  }

  test("plans as an equi-join on the bucket, not a nested loop") {
    val plan = RangeJoin
      .byBucket(points, "pt", intervals, "lo", "hi", 100L)
      .queryExecution.executedPlan
    val nested = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(nested.isEmpty, "range join must not fall back to a nested loop")
  }

  test("null points and null bounds drop, matching theta-join semantics") {
    // a comparison against NULL is never true in a theta join, so rows
    // with null point/lo/hi must produce no matches (not errors)
    val iv = Seq((1L, Some(100L), Some(200L)), (2L, None, Some(300L)),
      (3L, Some(50L), None))
      .toDF("interval_id", "lo", "hi")
    val pts = Seq((10L, Some(150L)), (11L, None)).toDF("point_id", "pt")
    val got = RangeJoin.byBucket(pts, "pt", iv, "lo", "hi", 100L)
      .select($"point_id", $"interval_id").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 1L)))
  }

  test("inverted intervals (lo > hi) match nothing and are not replicated") {
    val iv = Seq((1L, 100L, 200L), (2L, 5000L, -5000L)) // 2 is malformed
      .toDF("interval_id", "lo", "hi")
    val pts = Seq((10L, 150L), (11L, 0L)).toDF("point_id", "pt")
    val joined = RangeJoin.byBucket(pts, "pt", iv, "lo", "hi", 100L)
    assert(joined.select($"point_id", $"interval_id").as[(Long, Long)]
      .collect().toSet === Set((10L, 1L)))
    // and it is dropped BEFORE replication — the interval side of the
    // plan carries a lo <= hi filter, so interval 2's 100-bucket
    // descending span never materializes
    val analyzed = joined.queryExecution.analyzed.toString
    assert(analyzed.contains("(lo"),
      s"expected a lo <= hi pre-filter in the plan:\n$analyzed")
  }

  test("property: equals the reference theta join on random inputs") {
    // seeded random intervals/points, checked against an in-memory
    // nested-loop reference — the definitive bucket-boundary guard
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val iv = (1 to 30).map(i =>
        (i.toLong, rnd.between(-500L, 500L), rnd.between(0L, 300L)))
        .map { case (id, lo, span) => (id, lo, lo + span) }
      val pts = (1 to 200).map(i => (i.toLong, rnd.between(-600L, 900L)))
      val expectedPairs = (for {
        (pid, p) <- pts
        (iid, lo, hi) <- iv
        if p >= lo && p <= hi
      } yield (pid, iid)).toSet
      val width = Seq(1L, 17L, 250L, 5000L)(trial % 4)
      val got = RangeJoin.byBucket(
          pts.toDF("point_id", "pt"), "pt",
          iv.toDF("interval_id", "lo", "hi"), "lo", "hi", width)
        .select($"point_id", $"interval_id").as[(Long, Long)]
        .collect().toSet
      assert(got === expectedPairs, s"trial $trial width $width")
    }
  }

  test("overlap join: equals the reference theta join, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val left = (1 to 40).map { i =>
        val lo = rnd.between(-500L, 500L); (i.toLong, lo, lo + rnd.between(0L, 200L))
      }
      val right = (1 to 40).map { i =>
        val lo = rnd.between(-500L, 500L); (i.toLong, lo, lo + rnd.between(0L, 200L))
      }
      val expected = (for {
        (lid, llo, lhi) <- left
        (rid, rlo, rhi) <- right
        if llo <= rhi && rlo <= lhi
      } yield (lid, rid)).toSet
      val width = Seq(1L, 13L, 100L, 1000L)(trial % 4)
      // collect as a LIST first: any pair emitted in more than one
      // shared bucket would surface as a duplicate here, which the
      // exactly-once first-shared-bucket condition must prevent
      val got = RangeJoin.overlapByBucket(
          left.toDF("l_id", "l_lo", "l_hi"), "l_lo", "l_hi",
          right.toDF("r_id", "r_lo", "r_hi"), "r_lo", "r_hi", width)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"trial $trial width $width dups")
      assert(got.toSet === expected, s"trial $trial width $width")
    }
  }

  test("overlap join plans as an equi-join on the bucket, not a nested loop") {
    val df = RangeJoin.overlapByBucket(
      intervals.select($"interval_id".as("l_id"), $"lo".as("l_lo"), $"hi".as("l_hi")),
      "l_lo", "l_hi",
      intervals.select($"interval_id".as("r_id"), $"lo".as("r_lo"), $"hi".as("r_hi")),
      "r_lo", "r_hi", 100L)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"overlap join fell back to a nested loop:\n$plan")
  }
}
