package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.KMeansLite

/** Streaming embedding-outlier monitor — the batch-fit / stream-apply
  * form of the x61 batch triage: a quantizer fit OFFLINE (KMeansLite,
  * driver state k·d) plus per-cell distance boundaries derived from
  * the batch corpus turn outlier detection into a STATELESS streaming
  * projection, and the only streaming state is the watermarked
  * per-(window, cell) rate counters. This is the deployment shape for
  * "alert when the encoder starts emitting garbage": the expensive
  * global ranking happens in the nightly batch pass; the stream pays
  * k distance evaluations per row.
  *
  * The rank-based batch flag (top 5% per cell) becomes a THRESHOLD on
  * the stream: [[thresholds]] exports each cell's smallest flagged
  * 6-dp distance, and a streamed vector is an outlier iff its d2_6
  * reaches that boundary. On the batch corpus itself the two
  * definitions agree row-for-row (StreamOutliersSpec pins it); on new
  * data the threshold is the frozen calibration until the next refit,
  * exactly how a production monitor behaves between calibrations.
  */
object StreamOutliers {

  /** Assigned cell + 6-dp squared centroid distance for `vCol`. */
  private def scored(
      df: DataFrame, vCol: String, cents: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cell",
        KMeansLite.assign(col(vCol), cents).cast("long"))
      .withColumn("d2_6",
        round(array_min(KMeansLite.cellDistances(col(vCol), cents)), 6))

  /** Per-cell outlier boundary from the batch corpus: the smallest
    * d2_6 the x61 ranking flags (top ⌊pop/20⌋ per cell, farthest
    * first). Cells too small to flag anything (pop < 20) get no row —
    * the stream-side left join then flags nothing for them.
    */
  def thresholds(
      batch: DataFrame, vCol: String, cents: Seq[Seq[Double]]): DataFrame = {
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(col("d2_6").desc, col("vec_id"))
    scored(batch, vCol, cents)
      .withColumn("rnk", row_number().over(wCell).cast("long"))
      .withColumn("pop",
        count(lit(1)).over(Window.partitionBy(col("cell"))))
      .filter(col("rnk") * 20 <= col("pop"))
      .groupBy(col("cell")).agg(min(col("d2_6")).as("thr"))
  }

  /** Stateless stream scoring: stream-static broadcast join against
    * the (≤ k)-row threshold table; no streaming state at all.
    */
  def score(
      stream: DataFrame, vCol: String, cents: Seq[Seq[Double]],
      thr: DataFrame): DataFrame =
    scored(stream, vCol, cents)
      .join(broadcast(thr), Seq("cell"), "left")
      .withColumn("outlier",
        col("thr").isNotNull && col("d2_6") >= col("thr"))
      .drop("thr")

  /** Watermarked per-(window, cell) outlier rates over scored rows —
    * counter cells only, ≤ k per open window; append on window close.
    */
  def windowedRates(
      scoredStream: DataFrame, tsCol: String,
      windowLength: String, watermark: String): DataFrame =
    scoredStream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(col("outlier").cast("long")).as("n_outliers"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("cell"), col("n"), col("n_outliers"))
}
