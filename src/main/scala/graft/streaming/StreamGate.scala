package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The COMPOSED continuous ingest gate — x83's batch pipeline as one
  * streaming query (r11 verdict, missing #2): documents flow through
  *
  *   dedup → decontaminate → BPE-encode → shard append
  *
  * in a single plan, proving the per-operator streaming gates
  * actually compose instead of merely coexisting:
  *
  *  - [[StreamDedup.dedupStream]] — the ONLY stateful stage (bounded
  *    watermarked state); first arrival of a content hash passes
  *    through immediately.
  *  - [[StreamBloom.flag]] — document-level membership probe of the
  *    broadcast blocklist filter, a pure narrow map. (The n-gram
  *    hit-RATIO form x88 serves needs a per-document aggregation,
  *    which in append-mode streaming would add a second stateful
  *    stage; the ingest gate uses the exact-document filter and
  *    leaves ratio decontamination to the periodic batch pass —
  *    the same split as dedup's cross-window escape hatch.)
  *  - [[StreamBpe.encoded]] — frozen-rule tokenization, narrow.
  *  - [[StreamShards.sink]] — manifest-committed immutable shard
  *    append (exactly-once content under at-least-once delivery).
  *
  * Because the two middle stages are stateless narrow maps and the
  * sink is a pure function of (batch, committed high-water mark), the
  * gate's OUTPUT CONTENT is row-identical to running x83-style batch
  * stages over the union of all micro-batches — regardless of how
  * arrival is batched — with the one documented divergence class:
  * (shard, position) values depend on batch boundaries (each batch
  * appends past the previous high-water mark; a single batch packs the
  * same rows densely). StreamGateSpec pins content identity across a
  * 2-batch split, per-batch assignment identity, and replay
  * idempotence.
  */
object StreamGate {

  /** The stream-side transform: dedup → bloom gate → encode. Returns
    * the kept, encoded stream (doc rows + toks/n_tokens/tokens_md5).
    */
  def transform(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String, bloomBytes: Array[Byte],
      rules: Seq[(String, String)]): DataFrame =
    StreamBpe.encoded(
      StreamBloom.flag(
        StreamDedup.dedupStream(docs, textCol, tsCol, watermark),
        md5(col(textCol)), bloomBytes)
        .filter(!col("bloom_hit"))
        .drop("bloom_hit"),
      textCol, rules)

  /** The gate with the model-based quality stage at the head (x83's
    * stage-1 position): NB quality score → frozen-CDF Pareto
    * acceptance → dedup → decontaminate → encode. Both added stages
    * are pure narrow maps ([[StreamNb]]/[[StreamAccept]]), so the
    * composition's properties are unchanged — ONE stateful stage,
    * content identity across batching — and the quality gate being a
    * deterministic row-level filter at the head means the output
    * equals [[transform]] run over the accepted subset (the property
    * StreamGateSpec pins through the batch twin).
    */
  def transformQuality(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String, nb: StreamNb.Frozen,
      cdf: StreamAccept.FrozenCdf, bloomBytes: Array[Byte],
      rules: Seq[(String, String)]): DataFrame = {
    val kept = StreamAccept.gate(
      StreamNb.score(
        docs.withColumn("__qt", graft.ext.Text.tokens(col(textCol))),
        col("__qt"), nb),
      col(idCol), col("score_e6"), cdf)
      .filter(col("keep"))
      .drop("__qt", "n_toks", "score_e6", "pred", "rank_ppm", "u_ppm",
        "pareto_e6", "keep")
    transform(kept, textCol, tsCol, watermark, bloomBytes, rules)
  }

  /** The gate with DSIR target-relevance at the VERY head (the order
    * published pipelines use: select-for-target first, then quality,
    * then dedup/decontaminate): frozen-λ importance gate →
    * [[transformQuality]]. The DSIR stage is one more pure narrow map
    * ([[StreamDsir]]), so the composition invariants hold unchanged —
    * still ONE stateful stage — and the output equals
    * [[transformQuality]] over the DSIR-kept subset plus the `w_e6`
    * importance-weight column, which rides through to the output so
    * the keep decision stays replayable ([[StreamDsir]]'s stated
    * convention; ADVICE r12 flagged the earlier drop — StreamAcceptSpec
    * pins both the identity and the carried weight). The winnowing
    * near-dup gate
    * ([[StreamWinnow]]) stays OUTSIDE this plan on purpose: its
    * per-batch fingerprint windows are not expressible in an
    * append-mode streaming plan, so it runs in the foreachBatch sink
    * position — the same division of labor as dedup's cross-window
    * escape hatch.
    */
  def transformCurated(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String, lamE6: Seq[Long], tauE6: Long,
      nb: StreamNb.Frozen, cdf: StreamAccept.FrozenCdf,
      bloomBytes: Array[Byte], rules: Seq[(String, String)]): DataFrame = {
    val selected = StreamDsir.weight(
      docs.withColumn("__dt", graft.ext.Text.tokens(col(textCol))),
      col("__dt"), lamE6, tauE6)
      .filter(col("keep"))
      // w_e6 stays: the gate emits the weight so the decision replays
      .drop("__dt", "n_feats", "keep")
    transformQuality(selected, idCol, textCol, tsCol, watermark, nb,
      cdf, bloomBytes, rules)
  }

  /** Start the full gate: [[transform]] feeding the manifest-committed
    * shard sink, one streaming query end to end. `checkpoint` is the
    * production restart seam: with it set, a killed gate restarted
    * from the same directory resumes from the last committed offsets,
    * re-runs any in-flight batch, and the sink's manifest protocol
    * makes the re-run idempotent (partial data without a manifest is
    * cleaned and rewritten; committed batches are no-ops) — so the
    * final shard content equals the uninterrupted run's
    * (RoundThirteenSpec pins it byte-for-byte).
    */
  def start(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String, bloomBytes: Array[Byte],
      rules: Seq[(String, String)], keyCol: String, outDir: String,
      docsPerShard: Int, seed: Int,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = transform(docs, textCol, tsCol, watermark, bloomBytes, rules)
      // the array column is working state; shards carry the fingerprint
      .drop("toks")
      .writeStream
      .foreachBatch(StreamShards.sink(keyCol, outDir, docsPerShard, seed))
      .outputMode("append")
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
