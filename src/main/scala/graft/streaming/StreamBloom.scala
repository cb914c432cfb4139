package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomMightContain

/** Streaming decontamination against a static reference corpus — the
  * production form of x76's Bloom membership, continuous: the
  * reference blocklist is folded ONCE into a serialized Bloom filter
  * (a few MB of bits regardless of reference size), broadcast, and
  * every arriving document probes it via the native
  * [[BloomMightContain]] expression. The probe is a pure narrow map —
  * no join, no shuffle, no state, no watermark — so it composes with
  * any downstream streaming op and any output mode, which is exactly
  * why production pipelines gate ingest with a filter rather than a
  * reference join. Grams are bridged to the long-keyed filter with
  * xxhash64 on BOTH sides; false positives are the standard Bloom
  * trade (tunable via fpp), false negatives impossible
  * (StreamBloomSpec pins both properties and stream==batch equality).
  */
object StreamBloom {

  /** Serialized Bloom filter over the reference keys (any type —
    * hashed to long with xxhash64 first).
    */
  def filterBytes(ref: DataFrame, key: Column,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val hashed = ref.select(xxhash64(key).as("__k"))
    graft.ops.BloomPrune.keyFilterBytes(hashed, "__k", expectedItems, fpp)
  }

  /** Adds `bloom_hit` to a (streaming or batch) frame: whether `key`
    * might be in the reference filter.
    */
  def flag(df: DataFrame, key: Column, bloomBytes: Array[Byte]): DataFrame = {
    val bcast = df.sparkSession.sparkContext.broadcast(bloomBytes)
    val probe: Column = GraftExpressionBridge.column(
      BloomMightContain(
        GraftExpressionBridge.expression(xxhash64(key)), bcast))
    df.withColumn("bloom_hit", probe)
  }
}
