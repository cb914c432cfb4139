// Lives under org.apache.spark.sql because ExpectsInputTypes'
// AbstractDataType vocabulary is private[sql] — the usual home for
// library-shipped native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for `size(array_intersect(a, b))` over
  * two `array<string>` columns WITHOUT materializing the intersection
  * array — the 9th native expression, aimed at the candidate-pair hot
  * loops that only ever need the COUNT of distinct common elements:
  * every Jaccard (ext/Dedup.jaccard — x12's blocked all-pairs audit,
  * the x02/x36/x42 LSH verifiers) and the x67/x84 PPJoin/containment
  * overlap checks. The built-in form builds a per-pair hash set, then
  * allocates and fills a result ArrayData, then takes its length and
  * throws it away — at millions of candidate pairs the allocation is
  * the cost.
  *
  * Exact `size(array_intersect)` semantics, pinned by spec:
  * distinct-common-element count; a null ELEMENT present in both
  * arrays counts once (the built-in keeps one null); a null ARRAY
  * input yields null (matching size(null) = null under the non-legacy
  * default). Order-independent, so no order contract is needed.
  */
case class ArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "array_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // build the probe set from the SMALLER side: per-pair work is
    // O(|a| + |b|) either way but the live set stays minimal
    val (small, big) = if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var smallHasNull = false
    var i = 0
    val ns = small.numElements()
    while (i < ns) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var count = 0L
    var nullCounted = false
    var j = 0
    val nb = big.numElements()
    while (j < nb) {
      if (big.isNullAt(j)) {
        if (smallHasNull && !nullCounted) { count += 1; nullCounted = true }
      } else {
        val e = big.getUTF8String(j)
        if (set.remove(e)) count += 1
      }
      j += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val small = ctx.freshName("small")
      val big = ctx.freshName("big")
      val set = ctx.freshName("set")
      val smallHasNull = ctx.freshName("smallHasNull")
      val nullCounted = ctx.freshName("nullCounted")
      val count = ctx.freshName("count")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ns = ctx.freshName("ns")
      val nb = ctx.freshName("nb")
      val ad = classOf[ArrayData].getName
      val u8 = classOf[UTF8String].getName
      s"""
         |final $ad $small = $x.numElements() <= $y.numElements() ? $x : $y;
         |final $ad $big = $x.numElements() <= $y.numElements() ? $y : $x;
         |final int $ns = $small.numElements();
         |final java.util.HashSet<$u8> $set =
         |  new java.util.HashSet<$u8>($ns * 2);
         |boolean $smallHasNull = false;
         |for (int $i = 0; $i < $ns; $i++) {
         |  if ($small.isNullAt($i)) { $smallHasNull = true; }
         |  else { $set.add($small.getUTF8String($i)); }
         |}
         |long $count = 0L;
         |boolean $nullCounted = false;
         |final int $nb = $big.numElements();
         |for (int $j = 0; $j < $nb; $j++) {
         |  if ($big.isNullAt($j)) {
         |    if ($smallHasNull && !$nullCounted) { $count++; $nullCounted = true; }
         |  } else {
         |    if ($set.remove($big.getUTF8String($j))) { $count++; }
         |  }
         |}
         |${ev.value} = $count;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectSize =
    copy(left = newLeft, right = newRight)
}
