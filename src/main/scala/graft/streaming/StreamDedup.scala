package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup — the ingest-time half of the dedup surface
  * (ext/Dedup is the batch half): a document stream deduplicated by
  * content hash as it lands, so replayed or re-crawled texts never
  * reach the corpus.
  *
  * Built on `dropDuplicatesWithinWatermark`, which is the only
  * SCALABLE shape for streaming dedup: plain `dropDuplicates` on a
  * stream keeps every key seen forever (state grows with the corpus),
  * while the watermark variant expires state once an event time is
  * past the horizon — bounded state, at the cost of re-admitting a
  * duplicate that arrives later than the watermark window. For an
  * LLM-ingest pipeline that is the right trade: cross-window dups are
  * caught by the periodic batch dedup (x01/x14) downstream.
  *
  * The first occurrence passes through immediately (stateful filter,
  * not an aggregation — no emission latency); later occurrences within
  * the window are dropped on arrival.
  */
object StreamDedup {

  /** Dedup `docs` (a streaming frame) on the md5 of `textCol`, keeping
    * per-key state only within `watermark` of the stream's max `tsCol`.
    */
  def dedupStream(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Normalization-insensitive variant (case / whitespace collapse —
    * same canonical form as the batch `Dedup.normalizedText`).
    */
  def dedupStreamNormalized(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("content_hash",
        md5(graft.ext.Dedup.normalizedText(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
