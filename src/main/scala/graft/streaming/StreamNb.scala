package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming quality scoring against a FROZEN Naive Bayes model — the
  * serving form of x101 (train offline on the curated split, then gate
  * an ingest stream on the classifier score forever).
  *
  * The frozen model is the vocabulary llr table collected ONCE
  * (driver state bounded by the training vocabulary — Heaps-sublinear
  * in corpus, the StreamBpe frozen-rules discipline) and shipped as a
  * single map literal, so scoring is a PURE NARROW MAP: one
  * `aggregate` fold over each document's tokens, no explode, no join,
  * no shuffle, no watermark state. Like [[StreamBloom]], that is
  * exactly what lets it compose with any downstream streaming stage
  * and any output mode. At a production vocabulary too large for a
  * plan literal, the serve form becomes a foreachBatch equi-join of
  * the micro-batch's exploded tokens against the persisted model
  * table — the batch [[graft.ext.NaiveBayes.score]] verbatim, the
  * StreamRetrieve topology.
  *
  * One stated difference from the batch scorer: the narrow fold scores
  * EVERY row (an empty token array scores exactly the prior), while
  * the batch explode-join drops token-less docs; StreamNbSpec pins
  * row-identity on the non-empty set.
  */
object StreamNb {

  /** Vocabulary llr map + scalar consts, collected once. */
  final case class Frozen(llr: Map[String, Long], priorE6: Long,
      unseenE6: Long)

  /** Collect a trained model ([[graft.ext.NaiveBayes.train]] output)
    * into its frozen serving form. The collect is bounded by the
    * training VOCABULARY (never the corpus).
    */
  def freeze(model: DataFrame, consts: DataFrame): Frozen = {
    val m = model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = consts.collect().head
    Frozen(m, c.getLong(0), c.getLong(1))
  }

  /** Adds (n_toks, score_e6, pred) to a streaming or batch frame:
    * score = prior + Σ llr(token) with the smoothed-zero llr for
    * tokens outside the training vocabulary — the batch scorer's
    * arithmetic, folded in one codegen-friendly pass per row.
    */
  def score(df: DataFrame, toks: Column, frozen: Frozen): DataFrame = {
    val m = typedlit(frozen.llr)
    df.withColumn("n_toks", size(toks).cast("long"))
      .withColumn("score_e6",
        aggregate(toks, lit(frozen.priorE6), (acc, tok) =>
          acc + coalesce(element_at(m, tok), lit(frozen.unseenE6))))
      .withColumn("pred", col("score_e6") > 0L)
  }
}
