package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomMightContain

/** Bloom-filter join pruning — the scale pattern for joining a huge
  * fact table against a dimension that is too large to broadcast as
  * ROWS but whose KEY SET fits a sketch.
  *
  * A plain `fact ⋈ dim` shuffles every fact row on the join key even
  * when only a sliver of fact keys survive the join. Building a Bloom
  * filter over dim's keys (one tree-aggregated job, a few MB of bits)
  * and filtering fact BEFORE its shuffle turns the exchange from
  * O(|fact|) to O(|matching fact| / (1 - fpp)) — at 100 TB the
  * difference between shuffling the table and shuffling the answer.
  * False positives are harmless: the join itself removes them, so the
  * pruned join is row-identical to the plain join (q21's oracle proves
  * it with the UNPRUNED SQL).
  *
  * Spark's AQE can inject the same shape at runtime
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
  * is the explicit, tunable form — expected item count and fpp are the
  * caller's knobs, and the filter is reusable across queries.
  */
object BloomPrune {

  /** Serialized Bloom filter of `keyCol` (long) values of `dim`. */
  def keyFilterBytes(
      dim: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `fact` rows whose `factKey` might be in the broadcast sketch. */
  def pruned(fact: DataFrame, factKey: String, bloomBytes: Array[Byte]): DataFrame = {
    val bcast = fact.sparkSession.sparkContext.broadcast(bloomBytes)
    val probe: Column = GraftExpressionBridge.column(
      BloomMightContain(
        GraftExpressionBridge.expression(col(factKey).cast("long")), bcast))
    fact.filter(probe)
  }

  /** `fact ⋈ dim` with the fact side Bloom-pruned before its shuffle.
    * Row-identical to the plain inner join for any fpp.
    */
  def prunedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bytes = keyFilterBytes(dim, dimKey, expectedItems, fpp)
    pruned(fact, factKey, bytes).join(dim, col(factKey) === col(dimKey))
  }
}
