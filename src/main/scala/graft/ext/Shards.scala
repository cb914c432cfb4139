package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard write-out — the final step of a
  * pretraining-data pipeline (r10 verdict, missing #2): a seeded
  * global shuffle of the kept set plus fixed-size shard assignment,
  * so every (document → shard, position) pair is a pure function of
  * the data and the seed. Re-runs, re-sharded clusters, and the
  * DuckDB oracle agree row for row — the property rand()-based
  * shuffling can never give (the Sampling.esKey md5-order discipline
  * extended to the write-out).
  *
  * Scale shape: the global md5-order rank is computed WITHOUT a
  * single-partition sort — documents hash into 256 buckets by their
  * shuffle-key prefix (the first two hex chars, so bucket order IS
  * key-prefix order), each bucket ranks in parallel under a keyed
  * window, and bucket offsets come from a 256-row cumsum (the one
  * "global" window in the plan — its frame is exactly 256 rows at ANY
  * corpus size; PlanAudit carries the adjudication). At 100 TB the
  * bucket fan-out widens to 16^k buckets by taking k prefix chars
  * (`assign`'s `prefixLen`) — same plan, same 2-level rank, and the
  * assignment itself is provably k-invariant (see [[assign]]).
  *
  * Incremental appends: shipped shards are immutable. `assign` takes a
  * `rankOffset` — pass `(maxShard + 1) * docsPerShard` of the already
  * written corpus and the new batch lands in FRESH shards while every
  * existing (shard, position) stays exactly where training jobs
  * already read it (RoundElevenSpec pins the stability property).
  */
object Shards {

  /** Seeded, stable pseudo-random global order: md5("<seed>:<key>"). */
  def shuffleKey(key: Column, seed: Int): Column =
    md5(concat(lit(s"$seed:"), key.cast("string")))

  /** Assign (skey, shard, position) to every row: global 0-based rank
    * in (shuffle-key, key) order, then shard = rank div docsPerShard
    * and position = rank % docsPerShard.
    *
    * `prefixLen` (k) is the bucket fan-out knob — 16^k buckets from
    * the first k hex chars of the shuffle key. The assignment is
    * INVARIANT in k: global order is (skey, key), bucket order is
    * skey-prefix order (a prefix of the global sort key), and within a
    * bucket the window orders by the full (skey, key) again — so every
    * k slices the same total order at different granularity and the
    * ranks are bit-identical (RoundTwelveSpec pins k=1/2/3;
    * SCALE-SHARDK probes it at growing corpus sizes). The offset
    * cumsum — the one "global" window — is exactly 16^k rows at ANY
    * corpus size; k=2's 256 suits local/test scale, k=3's 4096 a
    * 100 TB run's executor count.
    */
  def assign(df: DataFrame, keyCol: Column, docsPerShard: Int,
      seed: Int, rankOffset: Long = 0L, prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      "prefixLen must be in [1, 8] (16^k bucket fan-out)")
    val wB = Window.partitionBy(col("_b"))
      .orderBy(col("skey"), col("_k"))
    // 16^prefixLen-row bucket-offset cumsum — the bounded global window
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = df
      .withColumn("_k", keyCol)
      .withColumn("skey", shuffleKey(keyCol, seed))
      .withColumn("_b", substring(col("skey"), 1, prefixLen))
      .withColumn("_lr", row_number().over(wB).cast("long"))
    val offsets = local.groupBy(col("_b"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .select(col("_b"), col("_off"))
    local.join(broadcast(offsets), "_b")
      .withColumn("_rk", col("_off") + col("_lr") - 1 + lit(rankOffset))
      .withColumn("shard", expr(s"_rk div $docsPerShard"))
      .withColumn("position", col("_rk") % docsPerShard)
      .drop("_b", "_k", "_lr", "_off", "_rk")
  }

  /** Write an assigned frame as one directory per shard
    * (`partitionBy(shard)`), rows sorted by position within each
    * shard file. `append = true` adds new shard directories without
    * touching existing ones (the incremental contract — pair with an
    * `assign(rankOffset = (maxShard + 1) * docsPerShard)`).
    */
  def write(assigned: DataFrame, outDir: String,
      append: Boolean = false): Unit =
    assigned
      .repartitionByRange(col("shard"))
      .sortWithinPartitions(col("shard"), col("position"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("shard").parquet(outDir)
}
