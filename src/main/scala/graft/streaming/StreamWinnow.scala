package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Winnow

/** Streaming near-duplicate gate over a FROZEN winnowing-fingerprint
  * index — the serve form of x111: the reference corpus is winnowed
  * ONCE into its distinct fingerprint-hash set, and every arriving
  * document is winnowed per micro-batch and scored by how much of its
  * own fingerprint set the index already contains. Unlike the Bloom
  * gate (exact-membership decontamination, StreamBloom), this flags
  * NEAR duplicates: the MOSS guarantee means any ≥ w+k−1-token overlap
  * with the reference surfaces as shared hashes, insertions and
  * deletions notwithstanding.
  *
  * Stateless per micro-batch (fingerprinting is a per-doc window over
  * the batch's own rows; the index side is a broadcast), so the gate
  * composes with the StreamGate chain in any order and replays
  * idempotently — the same doc always winnows to the same fingerprints
  * and the index is frozen (StreamWinnowSpec pins stream==batch
  * row-identity and the replay).
  *
  * Scale: the index is the reference's DISTINCT fingerprint hashes,
  * ~2/(w+1) of its gram count — for indexes past broadcast size the
  * join key is already the equi-join-able fp_h, so the same plan runs
  * shuffled (drop the broadcast hint); nothing else changes.
  */
object StreamWinnow {

  /** Distinct fingerprint hashes of the reference corpus. */
  def indexHashes(ref: DataFrame, toksCol: String, k: Int, w: Int)
      : DataFrame =
    Winnow.fingerprints(ref, toksCol, k, w).select(col("fp_h")).distinct()

  /** Per-doc near-dup score of a micro-batch against the frozen index:
    * (doc_id, n_fp, n_hit, share_ppm, near_dup). Docs too short to
    * fingerprint (< w+k−1 tokens) pass with n_fp=0, share 0 — a gate
    * must not silently drop what it cannot judge.
    */
  def flag(batch: DataFrame, toksCol: String, k: Int, w: Int,
      index: DataFrame, thresholdPpm: Long = 500000L): DataFrame = {
    val fps = Winnow.fingerprints(batch, toksCol, k, w)
    val scored = fps
      .join(broadcast(index.withColumn("hit", lit(1L))), Seq("fp_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("share_ppm", expr("n_hit * 1000000 div n_fp"))
    batch.select(col("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("share_ppm"), lit(0L)).as("share_ppm"))
      .withColumn("near_dup", col("share_ppm") >= thresholdPpm)
  }
}
