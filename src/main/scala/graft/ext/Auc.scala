package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AUC (area under the ROC curve) — the evaluation metric
  * of every quality/contamination classifier a data pipeline trains,
  * computed as the Mann–Whitney rank statistic WITHOUT a corpus-sized
  * sort or window:
  *
  *   2U = Σ over distinct scores s of n_pos(s)·(2·cumneg_below(s)
  *        + n_neg(s)),      AUC = 2U / (2·n_pos·n_neg)
  *
  * i.e. every (positive, negative) pair contributes 2 if the positive
  * scores higher, 1 on a tie, 0 otherwise — the ties-as-half
  * convention, carried in INTEGER doubled units so both engines agree
  * exactly and the one rounding point is the final division.
  *
  * Scale shape: the corpus collapses to a distinct-score histogram
  * first (one hash aggregate); the cumulative-negatives pass then
  * runs as the x86 two-level rank — scores range-bucketed into ≤ 257
  * buckets from a broadcast (min, max), a KEYED per-bucket window for
  * the local cumsum, and a ≤ 257-row global offset window (the
  * PlanAudit-adjudicated bound). Nothing corpus-sized is ever sorted
  * on one partition.
  */
object Auc {

  /** 1-row (n_pos, n_neg, u2, auc6) for an integer score column and a
    * boolean positive-class column.
    *
    * Null convention: rows with a NULL score or NULL label are DROPPED
    * up front (the builtin-aggregate null-skip discipline the Stream*
    * twins already follow) — before round 12 a null score silently
    * vanished at the offsets join instead, understating n_pos/n_neg
    * with no statement of intent.
    *
    * Overflow: u2 ≤ 2·n_pos·n_neg, so a single guard on the total pair
    * count bounds every per-score product AND the running sum. DuckDB
    * raises on int64 overflow while non-ANSI Spark wraps — the x78
    * assert_true discipline makes both engines refuse together.
    */
  def auc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val h = df.select(score.as("s"), positive.cast("int").as("p"))
      .filter(col("s").isNotNull && col("p").isNotNull)
      .groupBy(col("s"))
      .agg(sum(col("p")).cast("long").as("np"),
        sum(lit(1) - col("p")).cast("long").as("nn"))
    // totals ride the same tiny broadcast as the bucket bounds; the
    // guard (2·tp·tn ≤ Long.Max, checked with overflow-free sequential
    // divides) evaluates before any np·(2·cnb+nn) product is summed
    val bounds = h.agg(min(col("s")).as("lo"), max(col("s")).as("hi"),
      sum(col("np")).as("tp"), sum(col("nn")).as("tn"))
    val bucketed = h.crossJoin(broadcast(bounds))
      .filter(coalesce(assert_true(
        col("tp") <= lit(Long.MaxValue) / greatest(col("tn"), lit(1L)) / 2L,
        lit("Auc: 2*n_pos*n_neg would overflow long — " +
          "partition the evaluation set at this scale")),
        lit(true)))
      .withColumn("b", expr("(s - lo) div (((hi - lo) div 256) + 1)"))
    val wLocal = Window.partitionBy(col("b")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ 257-row bucket-offset cumsum — the bounded global window
    val wOff = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed
      .withColumn("cnb_local", coalesce(sum(col("nn")).over(wLocal), lit(0L)))
    val offsets = bucketed.groupBy(col("b"))
      .agg(sum(col("nn")).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
      .select(col("b"), col("off"))
    local.join(broadcast(offsets), "b")
      .withColumn("cnb", col("off") + col("cnb_local"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("cnb") * 2 + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2").cast("double") /
          (col("n_pos") * col("n_neg") * 2).cast("double"), 6).as("auc6"))
  }
}
