package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join — points matched to `[lo, hi]` intervals — via
  * fixed-width bucketing. The reference performs no joins at all
  * (SURVEY.md §2e), so this is north-star extension surface: the
  * "which events fall inside which campaign/session/validity window"
  * primitive that every training-data pipeline needs and that vanilla
  * Spark only offers as a theta join.
  *
  * Why not `probe.join(intervals, point >= lo && point <= hi)`: a join
  * with no equality predicate plans as BroadcastNestedLoopJoin (or a
  * cartesian), i.e. O(|probe| × |intervals|) comparisons — fine for a
  * handful of intervals, fatal when intervals scale with the corpus.
  *
  * The bucketed shape: pick a bucket width ~ the typical interval
  * length; each interval is REPLICATED to every bucket it overlaps
  * (`sequence(floor(lo/w), floor(hi/w))` — bounded fan-out when
  * interval length is bounded), each point belongs to EXACTLY ONE
  * bucket, and the join becomes an equi-join on the bucket id refined
  * by the actual range predicate. Each (point, interval) match is
  * produced exactly once — the point's single bucket is necessarily
  * one of the interval's replicas — so no post-join dedup is needed.
  * The shuffle is hash-partitioned on the bucket id: O(|probe| +
  * |intervals| · avg_span/w) rows, never a nested loop. Skewed buckets
  * (a hot hour) are ordinary AQE-splittable shuffle skew.
  *
  * This is the same replicate-to-overlapping-buckets strategy
  * documented for interval joins in public engines (e.g. Databricks'
  * range-join optimization, Flink's interval join); Spark has no
  * built-in, so composing it from `sequence` + `explode` + equi-join
  * is the (a)-tier implementation per SURVEY §4's ladder.
  */
object RangeJoin {

  /** Join `probe` rows to `intervals` rows where
    * `probe(pointCol) BETWEEN intervals(loCol) AND intervals(hiCol)`
    * (both bounds inclusive), all three columns numeric (e.g. epoch
    * millis).
    *
    * @param bucketWidth bucket size in the point/bound units; choose
    *                    ≥ the typical interval length so the per-
    *                    interval replication factor stays ~2
    * @return matched rows carrying all probe columns + all interval
    *         columns (names must not collide)
    */
  def byBucket(
      probe: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    // An inverted interval (lo > hi) can match nothing, but Spark's
    // 2-arg sequence(start, stop) infers a NEGATIVE step for it, so
    // the malformed row would still replicate to every bucket in its
    // (descending) span — wasted fan-out that the refine predicate
    // then discards. Drop such rows before replication.
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val pr = probe.withColumn("__bucket", bucketOf(col(pointCol)))
    pr.join(iv,
        pr("__bucket") === iv("__bucket") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join: rows pair where
    * `[lLo, lHi] ∩ [rLo, rHi] ≠ ∅` (inclusive bounds). The range×range
    * case [[byBucket]] doesn't cover: BOTH sides replicate to the
    * buckets they span, and a pair that shares several buckets would
    * surface once per shared bucket — so instead of a post-join
    * DISTINCT over data-sized output, the join emits each pair only in
    * the FIRST bucket both occupy (`max(bucketOf(lLo), bucketOf(rLo))`
    * — for overlapping intervals necessarily a bucket both cover):
    * exactly-once by construction, no dedup shuffle.
    *
    * Same scale posture as [[byBucket]]: shuffle is the bucket-id
    * equi-join, fan-out bounded by span/width, skew is ordinary AQE
    * shuffle skew. Column names must not collide across sides.
    */
  def overlapByBucket(
      left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val l = left.filter(col(lLo) <= col(lHi)).withColumn("__bucket",
      explode(sequence(bucketOf(col(lLo)), bucketOf(col(lHi)))))
    val r = right.filter(col(rLo) <= col(rHi)).withColumn("__bucket",
      explode(sequence(bucketOf(col(rLo)), bucketOf(col(rHi)))))
    l.join(r,
        l("__bucket") === r("__bucket") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          l("__bucket") === greatest(bucketOf(col(lLo)), bucketOf(col(rLo))))
      .drop("__bucket")
  }
}
