package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter membership against a reference corpus —
  * the decontamination primitive that scales past the equi-join x24
  * uses: instead of shipping the reference n-gram vocabulary to the
  * join (|vocab| grows with the reference corpus), the reference side
  * is folded into a FIXED m-bit filter and only the ≤ m set-bit
  * positions travel. At 100 TB the reference can be billions of grams;
  * the filter is still 2^16 positions (parameterizable), broadcast to
  * every executor, and the test side never shuffles on the gram.
  *
  * Determinism (the KMV/x27 playbook): position i of key x is the
  * first `hexWidth` hex chars of md5(i || ":" || x) — a string in a
  * 16^hexWidth-slot table. Both engines compute identical md5, so the
  * filter, every membership verdict, and every false positive are
  * bit-reproducible; the oracle validates the filter itself, including
  * its FP behavior, not a tolerance band.
  *
  * False-positive rate is the standard (1 − e^(−jn/m))^j; the x76 demo
  * surfaces it by also computing exact membership and reporting
  * per-document false-positive gram counts.
  */
object Bloom {

  /** Array of the j hash positions of `key`, each a `hexWidth`-hex-char
    * string (slot table size 16^hexWidth).
    */
  def positions(key: Column, j: Int, hexWidth: Int = 4): Column =
    array((1 to j).map(i =>
      substring(md5(concat_ws(":", lit(i.toString), key)), 1, hexWidth)): _*)

  /** The filter: distinct set-bit positions of the reference keys —
    * bounded by 16^hexWidth rows regardless of reference size, hence
    * always broadcast-able.
    */
  def build(ref: DataFrame, key: Column, j: Int, hexWidth: Int = 4): DataFrame =
    ref.select(explode(positions(key, j, hexWidth)).as("pos")).distinct()

  /** Per-key membership verdict: `keys` (any cardinality, duplicate
    * rows included) gains a boolean `bloom_hit` — true iff ALL j
    * positions are set. The only join is `keys × broadcast(bits)` on
    * the position string. The verdict is `min(matched) == 1`, not
    * `count == j`: every probe row either matched the one distinct
    * bits row (1) or missed (0), so the minimum is 1 exactly when no
    * probe missed — correct under duplicate key rows (whose probe rows
    * collapse into one group; a count-based verdict would see 2j and
    * emit a FALSE NEGATIVE — the round-10 advice finding) and under
    * colliding positions within one key's j probes alike.
    */
  def test(keys: DataFrame, key: Column, bits: DataFrame, j: Int,
      hexWidth: Int = 4): DataFrame = {
    val probed = keys.withColumn("__pos",
      explode(positions(key, j, hexWidth)))
    probed
      .join(broadcast(bits.withColumn("__set", lit(1L))),
        probed("__pos") === bits("pos"), "left")
      .drop("pos", "__pos")
      .groupBy(keys.columns.toIndexedSeq.map(col): _*)
      .agg((min(coalesce(col("__set"), lit(0L))) === 1L).as("bloom_hit"))
  }
}
