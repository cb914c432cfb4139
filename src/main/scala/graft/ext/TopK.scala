package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` UDAF — the §2i extension tier
  * (typed Aggregator) alongside the native expressions.
  *
  * Why an aggregate and not a window: `row_number().over(partitionBy
  * (q).orderBy(score))` must shuffle and SORT every candidate row of a
  * group before discarding all but k. This aggregator keeps a k-element
  * buffer, so the partial (map-side) aggregate reduces each partition
  * to ≤ k rows per group before the exchange — at corpus scale the
  * shuffle carries k·groups rows instead of all candidates. Semantics
  * are identical to the window formulation (score desc, id asc
  * tie-break); x17's oracle is literally x03's window SQL.
  */
object TopK {

  /** One scored candidate; `id` doubles as the deterministic tie-break. */
  case class Scored(score: Double, id: Long)

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  class TopKAggregator(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0, "k must be positive")

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.size < k) (buf :+ a).sorted(ord)
      else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
      else buf

    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      (x ++ y).sorted(ord).take(k)

    /** Buffers are kept sorted throughout, so finish is the identity —
      * the output array is already (score desc, id asc).
      */
    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column-usable UDAF: `topK(5)(scoreCol, idCol)` (the Scored fields
    * as positional arguments) → sorted `array<struct<score,id>>` of the
    * k best rows of the group.
    */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[Scored])
}
