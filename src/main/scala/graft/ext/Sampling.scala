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

  /** Efraimidis–Spirakis (2006) weighted-sampling key: rank rows by
    * u^(1/w) descending and take k — equivalently (and numerically
    * safer) by ln(u)/w descending, which this returns. u is the
    * md5-derived 32-bit uniform of the key (+1 so u > 0), making the
    * sample a pure function of the data like every split here: re-runs,
    * re-shards and the DuckDB oracle agree row-for-row. ln is the one
    * libm call, so it is quantized to 8 decimals BEFORE the weight
    * division (the x20 discipline — both engines then divide identical
    * doubles, and the division is correctly rounded), and the final key
    * to 12. Top-k per group is a keyed rank window — weighted
    * reservoir sampling without replacement, no global state, at any
    * corpus size.
    */
  def esKey(key: Column, weight: Column): Column = {
    val h = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = (h + 1.0) / 4294967296.0
    round(round(log(u), 8) / weight.cast("double"), 12)
  }
}
