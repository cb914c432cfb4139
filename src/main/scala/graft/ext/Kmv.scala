package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the "novel sketch" tier of the extension surface.
  *
  * The sketch keeps the k SMALLEST distinct hash values seen; since a
  * uniform hash scatters n distinct items uniformly over [0,1), the
  * k-th smallest fraction f estimates k/n, so n̂ = (k−1)/f (the −1 is
  * the standard unbiasing, Bar-Yossef et al. 2002). State is a bounded
  * sorted vector of ≤ k hashes — mergeable (union + re-take-k), so the
  * partial aggregate reduces every partition to ≤ k values per group
  * before the shuffle, exactly like a production sketch library.
  *
  * Why not `approx_count_distinct` (HLL): Spark's HLL estimate is not
  * reproducible in DuckDB, so it can't sit under the hash oracle. KMV
  * with md5 is fully deterministic — both engines compute the same
  * md5, keep the same k minima (fixed-width hex compares
  * lexicographically = numerically), and derive the same estimate —
  * so the ORACLE validates the sketch itself, not just a tolerance.
  *
  * Hashes are the first 8 hex chars of md5 (32 uniform bits);
  * fraction = (h + 1) / 2^32 so the estimate is finite even for the
  * all-zero hash. Estimates use exact integer→double conversions only.
  */
object Kmv {

  /** Bounded sorted-distinct-minima buffer over hex-string hashes. */
  class KmvAggregator(k: Int)
      extends Aggregator[String, Seq[String], Seq[String]] {
    require(k > 1, "k must be > 1 for the (k-1)/f estimator")

    override def zero: Seq[String] = Vector.empty

    override def reduce(buf: Seq[String], h: String): Seq[String] =
      if (h == null) buf
      // fast path: full buffer and h can't displace the current max
      else if (buf.size >= k && h >= buf.last) buf
      else {
        val i = buf.indexWhere(_ >= h)
        if (i >= 0 && buf(i) == h) buf // already present (distinct-ness)
        else {
          val ins = if (i < 0) buf :+ h
          else (buf.take(i) :+ h) ++ buf.drop(i)
          ins.take(k)
        }
      }

    override def merge(x: Seq[String], y: Seq[String]): Seq[String] =
      (x ++ y).distinct.sorted.take(k)

    override def finish(buf: Seq[String]): Seq[String] = buf

    override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** `kmv(k)(hashCol)` → sorted array of the k minimum distinct
    * 8-hex-char hashes of the group.
    */
  def kmv(k: Int): UserDefinedFunction =
    udaf(new KmvAggregator(k), Encoders.STRING)

  /** 8-hex-char (32-bit) md5-based KMV hash of a string column. */
  def hash8(c: Column): Column = substring(md5(c), 1, 8)

  /** Distinct-count estimate from a kmv(k) result array: (k−1)/f(kth)
    * when the sketch is full, else the exact buffer size (a non-full
    * sketch saw every distinct value). `round`ed to 4 decimals for
    * cross-engine comparison.
    */
  def estimate(sketch: Column, k: Int): Column = {
    // try_element_at: a non-full sketch has no k-th element and plain
    // element_at throws under ANSI; the `when` guard does not short-
    // circuit evaluation of the other branch
    val kth = try_element_at(sketch, lit(k))
    val frac = (conv(kth, 16, 10).cast("double") + 1.0) / 4294967296.0
    round(
      when(size(sketch) < k, size(sketch).cast("double"))
        .otherwise(lit((k - 1).toDouble) / frac),
      4)
  }
}
