package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog (Flajolet et al. 2007) distinct-count
  * sketch, the constant-space sibling of the KMV sketch in [[Kmv]]:
  * KMV keeps k minimum hashes (k·8 bytes of state); HLL keeps m=64
  * 5-bit registers (≤ 64 bytes), the shape every production engine
  * (Spark's `approx_count_distinct`, DuckDB, Druid, Presto) uses.
  *
  * Spark's own HLL++ is not reproducible in DuckDB, so — exactly like
  * [[Kmv]] — this one is rebuilt from the portable md5 primitive so
  * the DuckDB oracle can validate the SKETCH itself (every register,
  * the exact integer register sum, the final estimate), not a
  * tolerance band:
  *
  *   h       = first 8 hex chars of md5(key) — 32 uniform bits
  *   index   = high 6 bits  (64 registers)
  *   pattern = low 26 bits
  *   rho     = leading-zero count of pattern + 1 ∈ [1, 27]
  *             (= 27 − bit_length(pattern); both engines compute
  *             bit_length as length(bin(w)), exact integer math)
  *
  * The raw estimate is alpha_64 · m² / Σ 2^(−M_j). The float sum
  * Σ 2^(−M_j) is order-dependent, so it is carried as the EXACT
  * integer Σ 2^(27−M_j) (≤ 64·2^27 < 2^33, fits a long; absent
  * registers contribute 2^27): one final double division is the only
  * rounding point, identical cross-engine. Small-range correction
  * (linear counting m·ln(m/V) when E ≤ 2.5m and V > 0) follows the
  * paper; ln is the one libm call, so the estimate is rounded to 4
  * decimals before comparison (the x20 quantization pattern).
  *
  * Scale: the per-group partial aggregate reduces every partition to
  * ≤ 64 (group, index, rho) rows before the shuffle — sketch-sized
  * traffic at any corpus size, vs the corpus-sized shuffle of an
  * exact countDistinct.
  */
object Hll {

  /** Register count m = 2^B. */
  val B = 6
  val M = 1 << B // 64
  /** Pattern width: 32-bit hash minus B index bits. */
  val W = 26
  val PatternMask: Long = (1L << W) - 1
  /** 2^(W+1) — the register-sum contribution of an empty register
    * (M_j = 0), since the sum is carried scaled by 2^(W+1).
    */
  val EmptyWeight: Long = 1L << (W + 1)

  /** alpha_m · m² · 2^(W+1), the numerator of the raw estimate, folded
    * to one double so Spark and the oracle SQL share the literal bit
    * pattern (interpolated via toString, which round-trips exactly).
    */
  val RawNumerator: Double =
    0.7213 / (1.0 + 1.079 / M.toDouble) * M.toDouble * M.toDouble *
      EmptyWeight.toDouble

  /** 32-bit md5-derived hash as a long. */
  def h32(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long")

  /** High-B-bits register index in [0, M). */
  def regIndex(h: Column): Column = shiftright(h, W).cast("long")

  /** rho = leading-zero count of the W-bit pattern + 1 ∈ [1, W+1]. */
  def rho(h: Column): Column = {
    val w = h.bitwiseAND(lit(PatternMask))
    when(w === 0, lit(W + 1)).otherwise(lit(W + 1) - length(bin(w)))
  }

  /** Exact integer register weight 2^(W+1−M_j) of one PRESENT register
    * (apply to the per-(group, index) max-rho column, post-aggregation;
    * takes the column NAME so the shift amount stays a plain SQL
    * expression both engines parse identically).
    */
  def presentWeight(maxRhoCol: String): Column =
    expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${W + 1} - $maxRhoCol AS INT))")

  /** Estimate from the exact integer register sum and the
    * zero-register count, rounded to 4 decimals.
    */
  def estimate(sInt: Column, vZero: Column): Column = {
    val raw = lit(RawNumerator) / sInt.cast("double")
    round(
      when(raw <= 2.5 * M && vZero > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / vZero.cast("double")))
        .otherwise(raw),
      4)
  }

  // ------------------------------------------------- typed Aggregator form

  /** The M-register vector as a typed `Aggregator` over pre-hashed
    * [[h32]] longs — the single-aggregation form streaming needs
    * (streaming append mode forbids the two-level groupBy the batch
    * x77 plan uses). State is a fixed Array[Int] of M registers;
    * `merge` is elementwise max — commutative, associative AND
    * idempotent, so estimates are invariant to arrival order,
    * micro-batch boundaries and replayed duplicates.
    */
  class HllAggregator extends Aggregator[Long, Array[Int], Seq[Int]] {
    private def rhoOf(h: Long): (Int, Int) = {
      val idx = (h >>> W).toInt
      val w = h & PatternMask
      val r = if (w == 0L) W + 1
        else W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      (idx, r)
    }
    override def zero: Array[Int] = new Array[Int](M)
    override def reduce(buf: Array[Int], h: Long): Array[Int] = {
      val (idx, r) = rhoOf(h)
      if (r > buf(idx)) buf(idx) = r
      buf
    }
    override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
  }

  /** `hll(h32Col)` → the M-element register vector of the group. */
  def hll: UserDefinedFunction = udaf(new HllAggregator, Encoders.scalaLong)

  /** Exact integer register sum Σ 2^(W+1−M_j) over a FULL register
    * vector (the Aggregator's output; empty registers hold 0, so the
    * same shift covers them: 2^(W+1−0) = the empty weight). Takes the
    * column NAME — the SQL shiftleft accepts a computed shift amount,
    * the Scala `functions.shiftleft` API only a literal.
    */
  def registerSum(regsCol: String): Column =
    expr(s"""aggregate($regsCol, CAST(0 AS BIGINT),
            |  (acc, r) -> acc + shiftleft(CAST(1 AS BIGINT),
            |                              CAST(${W + 1} - r AS INT)))"""
      .stripMargin)

  /** Zero-register count V of a register vector. */
  def zeroCount(regs: Column): Column =
    size(filter(regs, r => r === 0)).cast("long")
}
