package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.Dsir

/** Streaming DSIR gate against a FROZEN importance-weight table — the
  * serving form of x112: λ is fit offline on the reference corpus
  * (target vs raw hashed-n-gram distributions), frozen to a 64-long
  * array literal, and every arriving document's importance weight is
  * one `aggregate` fold over its feature array — a PURE NARROW MAP, no
  * explode, no join, no shuffle, no state (the StreamNb/StreamBloom
  * composability class; at a bucket count too large for a plan
  * literal the serve form becomes the foreachBatch equi-join of the
  * exploded features against the persisted λ table — the
  * StreamRetrieve topology).
  *
  * Deployment freezes a THRESHOLD from the offline Gumbel top-k run
  * (e.g. the weight of the last selected doc) instead of re-running
  * the rank — a stream cannot rank against documents it has not seen,
  * and the paper's selection is importance-weighted anyway. Two stated
  * conventions: every row is scored (a single-token doc scores its
  * unigrams — [[Dsir.featureArray]]'s guard), and the gate emits the
  * weight so the keep decision is replayable.
  */
object StreamDsir {

  /** λ as a bucket-indexed array, collected once ([[Dsir.Buckets]]
    * rows of driver state). Missing buckets weigh 0.
    */
  def freeze(lam: DataFrame): Seq[Long] = {
    val m = lam.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until Dsir.Buckets).map(b => m.getOrElse(b.toLong, 0L))
  }

  /** Adds (n_feats, w_e6, keep) to a streaming or batch frame. */
  def weight(df: DataFrame, toks: Column, lamE6: Seq[Long],
      thresholdE6: Long): DataFrame = {
    val arr = typedlit(lamE6)
    df.withColumn("__feats", Dsir.featureArray(toks))
      .withColumn("n_feats", size(col("__feats")).cast("long"))
      .withColumn("w_e6",
        aggregate(col("__feats"), lit(0L), (acc, f) =>
          acc + element_at(arr, (Dsir.bucket(f) + 1).cast("int"))))
      .withColumn("keep", col("w_e6") >= thresholdE6)
      .drop("__feats")
  }
}
