package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream correlation (§2h, beyond the reference's surface):
  * join two live streams on a key within an event-time bound — the
  * attribution shape (outcome joins its trigger within N minutes).
  *
  * Scale semantics are all in the constraints:
  *  - both sides carry watermarks, so the join's buffered state is
  *    BOUNDED: a buffered row can be evicted once the other side's
  *    watermark passes its latest possible match time;
  *  - the time-range predicate (`secondary within [primary, primary +
  *    maxDelay]`) is what lets Spark derive that eviction horizon — an
  *    unconstrained stream-stream join would buffer both streams
  *    forever;
  *  - state is hash-partitioned on the join key, same as a batch
  *    shuffle join — no broadcast, no driver state.
  */
object StreamJoin {

  /** Inner-join `secondary` events to the `primary` event they follow
    * within `maxDelay`. Column names must be disjoint across the two
    * frames (streaming joins cannot alias ambiguous columns after the
    * fact). `watermark` bounds how late either side may arrive.
    */
  def within(
      primary: DataFrame, secondary: DataFrame,
      primaryKey: String, secondaryKey: String,
      primaryTs: String, secondaryTs: String,
      maxDelay: String, watermark: String): DataFrame = {
    val p = primary.withWatermark(primaryTs, watermark)
    val s = secondary.withWatermark(secondaryTs, watermark)
    p.join(s, expr(
      s"""$primaryKey = $secondaryKey AND
         |$secondaryTs >= $primaryTs AND
         |$secondaryTs <= $primaryTs + INTERVAL $maxDelay""".stripMargin))
  }

  /** Stream-static enrichment — the most common production join: each
    * micro-batch of the stream joins a STATIC dimension (lookup table,
    * metadata catalog). No state store is involved at all: the static
    * side is planned like any batch relation (broadcast under the
    * threshold, shuffle hash beyond), re-resolved per micro-batch, and
    * the stream side needs no watermark because nothing is buffered.
    * Left join so stream rows without a dimension match pass through
    * with nulls instead of silently dropping.
    */
  def enrich(
      stream: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    stream.join(dim, stream(streamKey) === dim(dimKey), "left")
}
