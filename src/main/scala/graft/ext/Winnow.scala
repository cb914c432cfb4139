package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
  * k-token gram, slide a w-hash window over the gram stream, and keep
  * the minimum hash of each window (rightmost occurrence on ties).
  * The selected (hash, position) set is the document's fingerprint;
  * the paper's guarantee is that any shared substring of at least
  * w + k − 1 tokens yields at least one shared fingerprint HASH, and
  * selection density converges to 2/(w+1).
  *
  * Determinism across engines: the argmin-with-rightmost-tie-break is
  * not a window aggregate by itself, so both engines minimize ONE
  * encoded long per gram, key = h·2^21 + (2^21 − 1 − idx). min(key)
  * over the w-frame picks the smallest hash and, among equal hashes,
  * the LARGEST idx — the paper's rightmost rule — and the winner
  * decodes exactly (h = key div 2^21, idx = 2^21 − 1 − key mod 2^21).
  * h is the first 10 md5 hex digits (40 bits), so key < 2^61: no
  * overflow. idx < 2^21 bounds the per-doc gram count at ~2M — at
  * production scale documents are chunked (ContentChunks) long before
  * that, and the encode path RAISES on the first gram past the span
  * (ADVICE r12: a wrapped key borrows from the hash part and can still
  * decode to plausible-looking minima, so the overflow must fail
  * loudly, not rely on visible corruption).
  *
  * Scale shape: gram hashing is a narrow per-doc transform; selection
  * is two window passes over ONE doc-keyed exchange (the unordered
  * gram count and the ordered frame-min reuse the same hash
  * partitioning); the fingerprint set is ~2/(w+1) of the gram stream.
  * Nothing corpus-sized crosses a single partition.
  */
object Winnow {

  /** Per-window encoded key domain: positions live in [0, 2^21). */
  val PosSpan: Long = 1L << 21

  /** Distinct (doc_id, fp_h, fp_pos) winnowing fingerprints of a
    * (doc_id, token-array) frame. `toksCol` must be a string array.
    */
  def fingerprints(df: DataFrame, toksCol: String, k: Int, w: Int)
      : DataFrame = {
    val grams = df
      .filter(size(col(toksCol)) >= k + w - 1)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size($toksCol) - $k), i -> " +
          s"CAST(conv(substring(md5(array_join(slice($toksCol, i + 1, " +
          s"$k), ' ')), 1, 10), 16, 10) AS BIGINT))")))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("h"))
    // guard the encode's position span: one codegen'd long compare per
    // gram; a doc long enough to overflow must abort the job, because
    // a borrowed-from-the-hash key selects WRONG minima silently
    val enc = grams.withColumn("key",
      when(col("idx") >= PosSpan, raise_error(concat(
        lit(s"Winnow: gram index >= 2^21 position span in doc_id="),
        col("doc_id").cast("string"),
        lit(" — chunk the document (ContentChunks) before fingerprinting"))))
        .otherwise(col("h") * PosSpan + (lit(PosSpan - 1) - col("idx"))))
    // both windows share the doc_id hash partitioning: one exchange
    val wDoc = Window.partitionBy(col("doc_id"))
    val wFrame = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      .rowsBetween(Window.currentRow, w - 1)
    enc
      .withColumn("n_grams", count(lit(1)).over(wDoc))
      .withColumn("sel", min(col("key")).over(wFrame))
      // only full windows select (the last w−1 frames are partial)
      .filter(col("idx") <= col("n_grams") - w)
      .select(col("doc_id"),
        expr(s"sel div ${PosSpan}").as("fp_h"),
        (lit(PosSpan - 1) - col("sel") % PosSpan).as("fp_pos"))
      .distinct()
  }

  /** Per-doc fingerprint summary with cross-document sharing: a
    * fingerprint hash seen in ≥2 distinct docs is `shared` (decided
    * with constant per-group state via min≠max over the hash key —
    * the x55 discipline, one shuffle on fp_h).
    */
  def summary(fps: DataFrame): DataFrame = {
    val wH = Window.partitionBy(col("fp_h"))
    fps
      .withColumn("mn", min(col("doc_id")).over(wH))
      .withColumn("mx", max(col("doc_id")).over(wH))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("mn") =!= col("mx"), 1L).otherwise(0L))
          .as("n_shared"))
      .withColumn("share_ppm", expr("n_shared * 1000000 div n_fp"))
  }
}
