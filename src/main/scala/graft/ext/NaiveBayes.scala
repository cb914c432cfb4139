package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the model-based quality
  * filtering step of LLM data curation (train a cheap linear
  * classifier on a curated positive set, score the whole corpus, gate
  * on the score — the documented GPT-3 / PaLM data-quality pattern;
  * reference capability surveyed in SURVEY.md §2's text-analysis row).
  *
  * Everything is counts plus ONE quantized log per vocabulary row, so
  * the learned model is exactly reproducible cross-engine (the x44
  * discipline: `round(ln(·), 6)` BEFORE the ×1e6 integer lift, all
  * downstream arithmetic integer):
  *
  *   llr(token) = ln( (c_pos+1)·(N_neg+V) / ((c_neg+1)·(N_pos+V)) )
  *   score(doc) = prior + Σ_tokens llr        (micro-units, Long)
  *
  * with add-one smoothing, N_class = total class token mass, V =
  * train vocabulary size; tokens unseen in training contribute the
  * smoothed-zero llr ln((N_neg+V)/(N_pos+V)).
  *
  * Scale shape: training is one corpus-shaped explode feeding ONE
  * vocabulary-bounded aggregate (token counts combine map-side, so
  * the shuffle carries the vocabulary, not the corpus — Heaps' law
  * keeps that sublinear in corpus size, the x124 type-table posture).
  * The model is a vocabulary-sized table carrying one Long per token;
  * scoring is one equi-join of the token stream against it (auto-
  * broadcast at demo vocabulary; at a production vocabulary it
  * degrades to a shuffle hash join keyed on the token — still linear,
  * one exchange) followed by a per-doc hash aggregate.
  */
object NaiveBayes {

  /** `round(round(ln(x), 6)·1e6)` as Long — the cross-engine log
    * quantization both engines reproduce bit-identically (x44/x78).
    */
  private def lnE6(x: Column): Column =
    round(round(log(x), 6) * 1e6).cast("long")

  /** Train on `(tokensCol: array<string>, labelCol: 0/1)` rows.
    *
    * Returns (model, consts): model = (token, llr_e6), vocabulary-
    * sized; consts = ONE row (prior_e6, unseen_e6). Priors are doc
    * counts with add-one smoothing so a single-class training set
    * still yields a finite model instead of ±∞.
    */
  def train(docs: DataFrame, tokensCol: String, labelCol: String)
      : (DataFrame, DataFrame) = {
    val tok = docs.select(col(labelCol).cast("long").as("label"),
      explode(col(tokensCol)).as("token"))
    // Materialize the vocabulary counts ONCE: `counts` feeds the model
    // (per-token llr), the class-mass totals AND (via those) the
    // consts row — without the checkpoint each consumer re-plans the
    // whole corpus explode+aggregate, so training scanned and
    // tokenized the corpus three times for one logical pass
    // (round-16 plan audit: x105's physical plan held the pipeline
    // twice more via `tot`/`consts`). The checkpointed frame is
    // vocabulary-sized — Heaps-sublinear in corpus — so the
    // materialization is bounded at any scale.
    val counts = tok.groupBy(col("token")).agg(
      sum(col("label")).as("c_pos"),
      sum(lit(1L) - col("label")).as("c_neg"))
      .localCheckpoint()
    // one row off the vocabulary table: class token mass + |V|
    val tot = counts.agg(
      sum(col("c_pos")).as("n_pos"), sum(col("c_neg")).as("n_neg"),
      count(lit(1)).as("v"))
    val pri = docs.agg(
      sum(col(labelCol).cast("long")).as("d_pos"),
      sum(lit(1L) - col(labelCol).cast("long")).as("d_neg"))
    val model = counts.crossJoin(broadcast(tot))
      .select(col("token"), lnE6(
        (col("c_pos") + lit(1.0)) * (col("n_neg") + col("v")) /
          ((col("c_neg") + lit(1.0)) * (col("n_pos") + col("v"))))
        .as("llr_e6"))
    val consts = tot.crossJoin(pri).select(
      lnE6((col("d_pos") + lit(1.0)) / (col("d_neg") + lit(1.0)))
        .as("prior_e6"),
      lnE6((col("n_neg") + col("v")).cast("double") /
        (col("n_pos") + col("v")).cast("double")).as("unseen_e6"))
    (model, consts)
  }

  /** Score `(keyCols…, tokensCol)` rows against a trained model:
    * per-key (n_toks, score_e6, pred) where score = prior + Σ llr
    * over the token MULTISET (multinomial — repeats count) and
    * pred = score > 0. Rows whose token array is empty produce no
    * output row (explode semantics, matching the oracle's unnest).
    */
  def score(docs: DataFrame, keyCols: Seq[String], tokensCol: String,
      model: DataFrame, consts: DataFrame): DataFrame = {
    val keys = keyCols.map(col)
    docs.select(keys :+ explode(col(tokensCol)).as("token"): _*)
      .join(model, Seq("token"), "left")
      .crossJoin(broadcast(consts))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_toks"),
        (first(col("prior_e6")) +
          sum(coalesce(col("llr_e6"), col("unseen_e6")))).as("score_e6"))
      .withColumn("pred", col("score_e6") > 0L)
  }
}
