package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and train/holdout splitting — the
  * reproducibility backbone of a training-data pipeline. `rand()`-based
  * sampling changes membership on every run, partition count, and
  * engine; hashing a stable key makes the split a pure function of the
  * data, so re-runs, backfills, and a 1000-executor re-shard all agree
  * on which rows are held out.
  *
  * The bucket is the first two hex chars of md5(key) → [0, 256) —
  * coarse on purpose: membership only needs enough resolution for the
  * split ratio, and two chars keep the oracle SQL exact.
  */
object Sampling {

  /** 256-bucket deterministic hash bucket of a key column. */
  def hashBucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("long")

  /** `trainBuckets`/256 of rows → "train", rest → "holdout". */
  def holdoutSplit(key: Column, trainBuckets: Int): Column = {
    require(trainBuckets > 0 && trainBuckets < 256, "need 0 < buckets < 256")
    when(hashBucket256(key) < trainBuckets, lit("train")).otherwise(lit("holdout"))
  }

  /** Keep `keepBuckets`/256 of rows — a narrow filter that pushes into
    * the scan's data filters; no shuffle, no state.
    */
  def deterministicSample(df: DataFrame, key: Column, keepBuckets: Int): DataFrame =
    df.filter(hashBucket256(key) < keepBuckets)
}
