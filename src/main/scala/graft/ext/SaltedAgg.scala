package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key-safe attachment of per-key aggregates to a corpus-sized
  * stream — replacing the `count/min/max over (partition by key)`
  * WINDOW shapes round 16 introduced (x44/x55/x60/x65 and
  * Dedup.weightedShingles), per the r16 verdict/ADVICE skew finding.
  *
  * Why the window form is skew-fragile: `agg(...) over (partition by
  * key)` routes EVERY occurrence of a key into one task, which SORTS
  * and BUFFERS the whole group (WindowExec materializes each
  * partition group in an ExternalAppendOnlyUnsafeRowArray). A
  * boilerplate shingle/unigram whose frequency is corpus-shaped
  * becomes a single-task sort+spill at 100 TB, and neither map-side
  * partial aggregation nor AQE skew handling applies to WindowExec.
  *
  * The shape here (guide §2.2/§2.3/§2.5, §3.1):
  *
  *  1. per-key aggregates ride a plain `groupBy(key)` — for the
  *     algebraic aggregates used here (count/min/max/sum) Spark
  *     plans a TWO-LEVEL aggregate automatically: a partial
  *     HashAggregate BEFORE the exchange bounds the hot key's traffic
  *     to one row per map task, so the aggregation itself is
  *     skew-safe with NO salt tier (an explicit (key, salt) level
  *     would add a round of exchanges for aggregates that already
  *     partially combine — measured strictly worse, see
  *     OPTIMIZATION_r17.md's negative results);
  *  2. the vocabulary-sized aggregate table joins back to the stream
  *     with NO join-strategy hint: at bench scale AQE broadcasts it
  *     (zero stream shuffle); when the vocabulary outgrows the
  *     broadcast threshold the planner falls back to a shuffle join
  *     whose skewed partitions AQE's skew-join splitting handles —
  *     the scale-adaptive behaviour a hint would pin wrongly for one
  *     of the two regimes.
  *
  * The attached values are identical to the window form for any
  * associative+commutative aggregate: partial ∘ final is a regrouping
  * of the same exact-integer fold (SaltedAggSpec pins it on a hot-key
  * fixture and checks the two-level plan shape).
  *
  * The stream-side pipeline is computed once per consumer (aggregate
  * + join): Catalyst cannot share the exchange because the two
  * consumers prune different columns (measured: forcing identical
  * pruning with dummy aggregates gets optimized away). For the
  * vocabulary-bounded keys these operators use, the broadcast attach
  * avoids any corpus-sized exchange at bench scale, which more than
  * pays for the second pipeline pass.
  */
object SaltedAgg {

  /** Attach per-`keyCol` aggregates (each aliased to its attached
    * name, e.g. `count(lit(1)).as("df")`) to every row of `df`.
    */
  def attach(df: DataFrame, keyCol: String, aggs: Seq[Column]): DataFrame =
    df.join(df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*), keyCol)
}
