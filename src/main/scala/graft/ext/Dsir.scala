package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR feature machinery (Xie et al., NeurIPS 2023 — data selection
  * via importance resampling), shared by the batch selector (x112) and
  * the streaming serve gate ([[graft.streaming.StreamDsir]]): hashed
  * unigram+bigram features into [[Buckets]] buckets, and the bucket
  * log-ratio weight table between a target and the raw distribution.
  *
  * Every ln rides the round(·,6)·1e6 integer lift, and the two
  * distributions' lns are kept separate so no integer product can
  * overflow — the weight of a doc is Σ λ_b over its feature stream,
  * exact integer e6 units in both engines.
  */
object Dsir {

  val Buckets = 64

  /** The unigram+bigram feature array of a token array. Docs with a
    * single token contribute just that unigram (no bigram exists) —
    * the batch selector filters those out up front; the serve gate
    * must score every row, so the guard lives here.
    */
  def featureArray(toks: Column): Column =
    when(size(toks) >= 2,
      concat(toks, transform(
        sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(toks)

  /** Feature → bucket: first 8 md5 hex digits mod [[Buckets]]. */
  def bucket(f: Column): Column =
    conv(substring(md5(f), 1, 8), 16, 10).cast("long") % Buckets

  /** λ_b table (b, lam_e6) from an exploded feature stream carrying an
    * `is_target` flag: quantized ln(p_target(b)) − ln(p_raw(b)) with
    * add-1 smoothing. One map-side-combined agg; the output is
    * [[Buckets]] rows.
    */
  def lambdaTable(feats: DataFrame, isTarget: Column): DataFrame = {
    def lnE6(num: Column, den: Column): Column =
      round(round(log(num.cast("double") / den.cast("double")), 6)
        * 1e6).cast("long")
    val model = feats.groupBy(col("b"))
      .agg(count(lit(1)).as("raw_n"),
        sum(when(isTarget, 1L).otherwise(0L)).as("tgt_n"))
    val tot = model.agg(sum(col("raw_n")).as("raw_tot"),
      sum(col("tgt_n")).as("tgt_tot"))
    model.crossJoin(broadcast(tot))
      .withColumn("lam_e6",
        lnE6(col("tgt_n") + 1, col("tgt_tot") + Buckets)
          - lnE6(col("raw_n") + 1, col("raw_tot") + Buckets))
      .select(col("b"), col("lam_e6"))
  }
}
