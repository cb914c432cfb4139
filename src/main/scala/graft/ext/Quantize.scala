package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric int8 vector quantization — the storage-compression
  * operator of an embedding pipeline (4× smaller than float32, 8×
  * smaller than the double working form; ANN recall loss is bounded by
  * the per-vector scale).
  *
  * Per vector: `scale = 127 / max|x_i|`, `q_i = round(x_i · scale)` ∈
  * [-127, 127] (the max element maps to ±127 by construction, so no
  * clipping branch is needed), reconstruction `q_i / scale`.
  *
  * Every step is an elementwise double op (no accumulation), so the
  * DuckDB oracle reproduces it bit-for-bit: `list_max` is
  * order-independent, the scale division and products are IEEE-exact
  * replays, and round-half-away-from-zero matches Spark's HALF_UP on
  * the same doubles. All-zero vectors quantize with scale 1 (q = 0).
  */
object Quantize {

  def maxAbs(v: Column): Column = array_max(transform(v, x => abs(x)))

  def int8Scale(v: Column): Column =
    when(maxAbs(v) === 0.0, lit(1.0)).otherwise(lit(127.0) / maxAbs(v))

  /** `array<int>` in [-127, 127] (int, not tinyint, for cross-engine
    * dtype parity in the oracle compare).
    */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x => round(x * scale).cast("int"))

  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") / scale)

  /** Max elementwise reconstruction error — ≤ 0.5/scale by construction. */
  def maxError(v: Column, deq: Column): Column =
    array_max(zip_with(v, deq, (x, y) => abs(x - y)))
}
