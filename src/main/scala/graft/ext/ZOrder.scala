package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering — multi-dimensional data
  * clustering for scan pruning (north-star extension; the technique
  * behind `OPTIMIZE ZORDER BY` in public lakehouse engines and Morton-
  * curve spatial indexing generally).
  *
  * A parquet table sorted on ONE column prunes row groups only for
  * predicates on that column: every file spans the full range of every
  * other dimension, so a selective filter on a second column still
  * scans the whole table. Interleaving the bits of two (or more)
  * normalized key columns into one sort key makes files cover compact
  * RECTANGLES of the key space instead of thin slices — min/max file
  * statistics then prune for predicates on EITHER dimension. At 100 TB
  * this is the difference between scanning ~1/k of the files for a
  * 1/k-selective filter on dimension 2 and scanning all of them.
  *
  * The interleave itself is integer column arithmetic (shift/mask/add),
  * fully codegen'd. Normalization scales against broadcast min/max
  * bounds; note that Spark's `/` on longs is DOUBLE division followed
  * by a truncating cast (see [[normalize255]]) — deterministic, but
  * not the integer division it resembles, and the x41 oracle mirrors
  * the same double-then-truncate sequence explicitly.
  */
object ZOrder {

  /** Scale an integer column to [0, 255] given its (broadcastable)
    * min/max bounds: `(v - min) * 255 / (max - min)`, truncated. The
    * `/` here is Spark's long division = IEEE DOUBLE division, and the
    * trailing cast truncates toward zero — engine-identical only when
    * the oracle repeats the same double-divide-then-truncate (x41's
    * SQL does; a true integer division can differ by one at quotients
    * that double-rounding carries across an integer boundary).
    */
  def normalize255(v: Column, min: Column, max: Column): Column =
    when(max === min, lit(0L))
      .otherwise(((v - min).cast("long") * 255L) / ((max - min).cast("long")))
      .cast("long")

  /** Morton-interleave two 8-bit values (each in [0, 255]) into a
    * 16-bit z-value: bit i of `x` lands at position 2i+1, bit i of `y`
    * at position 2i. Nearby (x, y) points get nearby z-values, so a
    * z-sorted layout stores them in the same file.
    */
  def interleave8(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Per-bucket min/max statistics of both dimensions under a given
    * layout order — the file-level metadata a scan consults. `nBuckets`
    * models the file count; `orderKeys` models the table's sort order
    * (the trailing unique tie-break is the caller's responsibility so
    * bucket assignment is deterministic). One window pass (ntile) + one
    * hash aggregate.
    */
  def bucketStats(
      df: DataFrame, nBuckets: Int, xCol: String, yCol: String,
      orderKeys: Column*): DataFrame = {
    // METRIC HARNESS ONLY: the global ntile sorts the demo table on one
    // partition to model per-file min/max stats. Writing a z-ordered
    // LAYOUT at scale never does this — it is repartitionByRange(z) +
    // sortWithinPartitions, which sorts each output file independently.
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderKeys: _*)
    df.withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
  }
}
