package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Shards

/** Streaming training-shard write-out — x86's immutable-append
  * contract as a foreachBatch sink: each micro-batch of kept documents
  * becomes FRESH fixed-size shards appended past everything already
  * written, so training jobs can start reading shard N while shard
  * N+1 is still being produced and no shipped (shard, position) ever
  * moves.
  *
  * Exactly-once: the K2 (dt, batch) idempotency discipline — every
  * row carries its micro-batch id in `_batch_id`, and a replayed batch
  * (foreachBatch re-delivery after a failure) is detected by probing
  * the written store for that id and SKIPPED, so at-least-once
  * delivery from the engine becomes exactly-once shard content.
  * Within a batch the assignment is [[Shards.assign]] — a pure
  * function of (data, seed), so a re-run of the same batch would
  * produce byte-identical shards anyway; the skip just avoids
  * duplicate files.
  *
  * Scale: the only cross-batch state is the max written shard id, read
  * from the store's partition column (directory listing, not data
  * scan) — no growing driver state, no state store.
  */
object StreamShards {

  /** Append one micro-batch to the shard store. Returns the number of
    * rows written (0 for an empty or replayed batch).
    */
  def appendBatch(batch: DataFrame, batchId: Long, keyCol: String,
      outDir: String, docsPerShard: Int, seed: Int): Long = {
    if (batch.isEmpty) return 0L
    val spark = batch.sparkSession
    val existing = readStore(spark, outDir)
    val replayed = existing.exists(
      _.filter(col("_batch_id") === batchId).limit(1).count() > 0)
    if (replayed) return 0L
    val nextShard = existing
      .map(_.agg(max(col("shard").cast("long"))).head().getLong(0) + 1)
      .getOrElse(0L)
    val assigned = Shards.assign(
      batch.withColumn("_batch_id", lit(batchId)), col(keyCol),
      docsPerShard, seed, rankOffset = nextShard * docsPerShard)
    Shards.write(assigned, outDir, append = true)
    assigned.count()
  }

  /** The written shard store, if any batch has landed yet. An
    * existing-but-empty directory (a sink created ahead of the first
    * batch) counts as no store — parquet can't infer a schema from it.
    */
  def readStore(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val d = new java.io.File(outDir)
    val hasShards = d.exists() &&
      Option(d.listFiles()).exists(_.exists(_.getName.startsWith("shard=")))
    if (hasShards) Some(spark.read.parquet(outDir)) else None
  }

  /** foreachBatch function wiring [[appendBatch]] into
    * `writeStream.foreachBatch(StreamShards.sink(...))`.
    */
  def sink(keyCol: String, outDir: String, docsPerShard: Int,
      seed: Int): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      appendBatch(batch, batchId, keyCol, outDir, docsPerShard, seed)
      ()
    }
}
