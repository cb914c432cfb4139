package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Batch as-of join: for every left row, the most recent right row with
  * the same key at-or-before the left row's time. The reference has no
  * joins at all (SURVEY.md §2e) — this is engine-extension surface for
  * the operator Spark itself lacks (time-series point-in-time lookup,
  * click→purchase attribution, price-as-of-trade).
  *
  * Formulation: union-then-window, NOT an inequality join. Both sides
  * are tagged and unioned, then a single window partitioned on the key
  * and ordered by (time, side, tiebreak) carries each right row's
  * payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding frame; left rows then just keep what they
  * inherited. Right rows sort BEFORE left rows at equal timestamps
  * (side 0 < 1), giving at-or-before semantics.
  *
  * The payload travels as ONE struct through a single
  * `last(ignoreNulls)`: every attached column comes from the same
  * latest at-or-before right row, and a null INSIDE that row's payload
  * stays null. Carrying each column independently would stitch values
  * from different right rows whenever some payload columns are null —
  * not as-of semantics.
  *
  * Why this shape at 100 TB: a naive `l JOIN r ON l.key = r.key AND
  * r.ts <= l.ts` + max-per-left is a range join — Catalyst can only
  * nested-loop it within key groups, O(|l|·|r|) on a hot key. The
  * union-window form is ONE hash shuffle of l+r on the key followed by
  * a per-partition sort: O((|l|+|r|) log) per partition, no pairwise
  * blow-up, and it reuses the exchange if the output feeds another
  * key-partitioned op. Skewed keys degrade to a big sort, not a
  * cartesian square.
  */
object AsOfJoin {

  /** @param left      probe side (rows preserved exactly once)
    * @param right     reference side whose latest at-or-before row is attached
    * @param key       equi-join key column name (same name both sides)
    * @param time      event-time column name (same name both sides)
    * @param tiebreak  right-side column disambiguating equal timestamps
    *                  (latest in (time, tiebreak) order wins)
    * @param payload   right-side columns to attach, each emitted as
    *                  `asof_<name>` (all null when no right row precedes)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           tiebreak: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = StructType(
      payload.map(p => StructField(p, right.schema(p).dataType, nullable = true)))
    val tagged = left
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(right.schema(tiebreak).dataType))
      .select(col(key) +: col(time) +: col("__side") +: col("__tb") +:
        leftCols.filterNot(c => c == key || c == time).map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val ref = right
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tiebreak))
      .select(col(key) +: col(time) +: col("__side") +: col("__tb") +:
        leftCols.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(p => col(p).as(p)): _*).as("__p"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.unionByName(ref)
      .withColumn("__carried", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(time)) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        payload.map(p => col("__carried").getField(p).as(s"asof_$p")): _*)
  }
}
