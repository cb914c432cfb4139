package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context packing — the concat-and-chunk step of LLM training-data
  * prep: documents are (conceptually) concatenated in a deterministic
  * order and the token stream is cut into fixed-size training contexts;
  * each document lands in a span of chunk ids, possibly straddling a
  * boundary.
  *
  * Scale shape: the running token offset is a window cumsum, which has
  * a serial dependency — so the operator packs WITHIN a shard key
  * (e.g. (source, lang)), never globally. Each shard's window is
  * partition-local state; shards pack in parallel and a global pack at
  * 100 TB is recovered by treating the shard id as the high bits of
  * the chunk id. All arithmetic is integer-exact, so the oracle
  * reproduces it digit-for-digit.
  */
object Pack {

  /** Per-document chunk spans for `chunkTokens`-sized contexts, packed
    * within `shardCols` in ascending `orderCol` order. Adds:
    * `n_tokens`, `tok_offset` (tokens before this doc in its shard),
    * `first_chunk`, `last_chunk`, `n_chunks` (all 0-based, shard-local).
    * Empty documents occupy no tokens: they are assigned the chunk at
    * their offset, spanning a single chunk.
    */
  def contextSpans(
      docs: DataFrame, tokensCol: Column, orderCol: Column,
      chunkTokens: Int, shardCols: Column*): DataFrame = {
    require(chunkTokens > 0, "chunk size must be positive")
    val w = Window.partitionBy(shardCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = lit(chunkTokens.toLong)
    docs
      .withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("tok_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("first_chunk", floor(col("tok_offset") / c))
      .withColumn("last_chunk",
        floor((col("tok_offset") + greatest(col("n_tokens"), lit(1L)) - 1) / c))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }
}
