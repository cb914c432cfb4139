package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed join keys — the explicit-control companion to
  * AQE's runtime skew-join splitting (SURVEY.md §4 scale list).
  *
  * A shuffle join sends every row of a key to one reducer; a hot key
  * becomes one straggler task no matter how many executors exist. The
  * salted form scatters the fact side uniformly across `salts`
  * sub-keys and replicates the (small, but too big or too mid-plan to
  * broadcast) dim side once per sub-key, so the hot key's rows land on
  * `salts` tasks instead of one. Deterministic: the salt is a content
  * hash, not rand(), so replays and retries partition identically.
  *
  * Prefer, in order: `broadcast(dim)` when the dim fits; AQE skew join
  * (on by default) for plain sort-merge joins; THIS when the join must
  * shuffle and the skew is known and heavy (the classic web-scale
  * "null-key / power-law id" case).
  */
object SkewJoin {

  /** Inner equi-join `fact.factKey == dim.dimKey` with `salts`-way salt
    * scattering. Result is row-identical to the unsalted join.
    */
  def salted(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val sf = fact.withColumn("_fsalt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)).cast("int"))
    val sd = dim.withColumn("_dsalt",
      explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd, col(factKey) === col(dimKey) && col("_fsalt") === col("_dsalt"))
      .drop("_fsalt", "_dsalt")
  }
}
