package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift arithmetic shared by the batch mix monitor (x54)
  * and [[graft.streaming.StreamDrift]] — one definition, so the two
  * paths cannot diverge (the same sharing DailyRollup.aggExprs does
  * for the rollup).
  *
  * KL(group ‖ reference) over unigram distributions, computed entirely
  * in integers once per-token ln p is quantized to micro-units (the
  * x32 idiom: round to 6 decimals BEFORE scaling — libm ln is not
  * correctly rounded cross-engine, the quantization makes both agree).
  * Each term c_s·(lnp_s − lnp_ref) is an integer, so summation order
  * cannot perturb the result; greatest(…, 0) pins the ±quantization
  * wobble of a near-zero KL to exactly 0 (integer division semantics
  * diverge on negatives between engines).
  */
object Drift {

  /** ln(c/n) in integer micro-units. */
  def lpMicro(c: Column, n: Column): Column =
    round(round(log(c.cast("double") / n.cast("double")), 6) * 1e6)
      .cast("long")

  /** Per-group KL against a reference distribution.
    *
    * @param counts    (groupCols…, token, c_s) — token counts per group;
    *                  group support must be ⊆ reference support (no
    *                  smoothing — true by construction when the
    *                  reference is the whole corpus)
    * @param reference (token, c) — reference token counts; its total is
    *                  derived here and broadcast as a 1-row scalar
    * @return (groupCols…, n_tokens, n_distinct, kl_micro)
    *
    * Scale shape: one aggregate for group totals, a token equi-join
    * (reference side is vocabulary-sized — broadcast at real vocab
    * counts too), output one row per group at any corpus size.
    */
  def klMicro(
      counts: DataFrame, groupCols: Seq[String],
      reference: DataFrame): DataFrame = {
    val g = groupCols.map(col)
    // totals shares lineage with counts — RENAME its group columns (an
    // alias mints fresh attribute ids) so the self-join resolves
    // instead of tripping conflicting references (the StreamCms trick)
    val totals = counts.groupBy(g: _*).agg(sum(col("c_s")).as("n_s"))
      .select(groupCols.map(c => col(c).as(s"__drift_$c")) :+ col("n_s"): _*)
    val refTotal = reference.agg(sum(col("c")).as("n"))
    counts.join(totals,
        groupCols.map(c => col(c) === col(s"__drift_$c")).reduce(_ && _))
      .drop(groupCols.map(s"__drift_" + _): _*)
      .join(reference, "token")
      .crossJoin(broadcast(refTotal))
      .withColumn("term",
        col("c_s") * (lpMicro(col("c_s"), col("n_s"))
          - lpMicro(col("c"), col("n"))))
      .groupBy(g: _*)
      .agg(max(col("n_s")).as("n_tokens"),
        countDistinct(col("token")).as("n_distinct"),
        sum(col("term")).as("kl_sum"))
      .select(g ++ Seq(col("n_tokens"), col("n_distinct"),
        expr("greatest(kl_sum, 0) div n_tokens").as("kl_micro")): _*)
  }
}
