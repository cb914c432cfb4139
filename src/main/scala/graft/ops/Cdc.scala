package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply — collapse a change log (insert/update/delete events per
  * key) into the current state of the table. The reference's upsert is
  * a single-day delete-then-insert (update sql:2-36, K4); this is the
  * general form a warehouse needs when the upstream emits row-level
  * changes (Debezium-style op streams, lakehouse MERGE feeds): keep
  * each key's latest change, drop keys whose latest change is a
  * delete.
  *
  * Plan shape: ONE window shuffle on the key — `row_number()` picks
  * the latest change and `count()` over the same partition rides the
  * identical exchange (no second shuffle). The join-free formulation
  * matters at scale: the "join each key to its max(seq)" alternative
  * shuffles the log twice and magnifies hot-key skew, and a
  * groupBy(max(struct(seq, payload))) forces every payload column
  * through the aggregate buffer.
  */
object Cdc {

  /** @param changes  change log; one row per change event
    * @param key      entity key column name
    * @param ordering columns fixing the change order within a key,
    *                 later = newer; must be a total order (pass a
    *                 tiebreak, e.g. the change id) or the survivor is
    *                 nondeterministic. Null ordering values sort LAST
    *                 under the descending pick (Spark desc = nulls
    *                 last), i.e. a null-sequenced change never wins
    *                 over a sequenced one
    * @param opCol    operation column; rows whose LATEST op equals
    *                 `deleteOp` are dropped from the state. The
    *                 comparison is null-safe: a malformed change with a
    *                 NULL op is kept (surfaced to the consumer), never
    *                 silently treated as a tombstone
    * @return one row per live key: the latest change's columns plus
    *         `n_changes` (how many log rows the key had)
    */
  def applyLatest(
      changes: DataFrame, key: String, ordering: Seq[Column],
      opCol: String, deleteOp: String = "D"): DataFrame = {
    val byKey = Window.partitionBy(col(key))
    val w = byKey.orderBy(ordering.map(_.desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(byKey).cast("long"))
      .filter(col("__rn") === 1 && !(col(opCol) <=> lit(deleteOp)))
      .drop("__rn")
  }
}
