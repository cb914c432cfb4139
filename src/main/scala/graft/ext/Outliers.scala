package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-outlier scoring shared by the x61 batch triage and
  * [[graft.streaming.StreamOutliers]] — one definition, so the batch
  * flag and the exported stream calibration cannot drift (the Drift
  * batch/stream sharing discipline).
  *
  * The flag is RANK-based with ties sharing a rank (`rank()`, ordered
  * on the 6-dp distance alone): a cell flags its top ~5% by centroid
  * distance, and rows tied at the boundary flag all-or-none. That tie
  * rule is what makes the flag set a pure down-set in distance order —
  * `{d2_6 ≥ min flagged d2_6}` EXACTLY — so a per-cell threshold
  * exported from the batch pass reproduces the batch flags
  * row-for-row on the calibration corpus, ties included. (A
  * row_number flag with an id tie-break can split a tie group; no
  * threshold can reproduce that split.)
  */
object Outliers {

  /** Per-row (idCol, cell, d2_6, rnk, pop, outlier): assigned cell,
    * 6-dp squared centroid distance, deterministic display rank
    * (ties broken by id), population, and the rank-based flag.
    */
  def scored(
      df: DataFrame, idCol: String, vCol: String,
      cents: Seq[Seq[Double]]): DataFrame = {
    val cell = Window.partitionBy(col("cell"))
    df.select(col(idCol),
        KMeansLite.assign(col(vCol), cents).cast("long").as("cell"),
        round(array_min(KMeansLite.cellDistances(col(vCol), cents)), 6)
          .as("d2_6"))
      .withColumn("rnk", row_number().over(
        cell.orderBy(col("d2_6").desc, col(idCol))).cast("long"))
      .withColumn("pop", count(lit(1)).over(cell))
      .withColumn("outlier",
        rank().over(cell.orderBy(col("d2_6").desc)) * 20 <= col("pop"))
  }

  /** Per-cell boundary: the smallest flagged distance. Flagging
    * `d2_6 ≥ thr` reproduces [[scored]]'s flag set exactly (see the
    * object doc for why ties cannot break this). Cells flagging
    * nothing (pop < 20) get no row.
    */
  def thresholds(
      df: DataFrame, idCol: String, vCol: String,
      cents: Seq[Seq[Double]]): DataFrame =
    scored(df, idCol, vCol, cents)
      .filter(col("outlier"))
      .groupBy(col("cell")).agg(min(col("d2_6")).as("thr"))
}
