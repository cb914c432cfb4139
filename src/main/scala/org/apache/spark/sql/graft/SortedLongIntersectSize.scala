// Lives under org.apache.spark.sql because ExpectsInputTypes'
// AbstractDataType vocabulary is private[sql] — the usual home for
// library-shipped native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression: distinct-common-element count of two
  * SORTED `array<long>` columns via a two-pointer merge — the 11th
  * native expression, built for verification loops over MILLIONS of
  * candidate pairs (x67's PPJoin verify: SCALE-SF10 measured 29M
  * candidates at 40× corpus, where [[ArrayIntersectSize]]'s per-pair
  * HashSet of UTF8Strings was 174 s of the 226 s wall — hashing the
  * shingle sets ONCE per document to sorted int64 and merge-counting
  * per pair removes both the string shuffle mass and the per-pair
  * allocation).
  *
  * CONTRACT (caller-enforced, stated here because the expression
  * cannot check it cheaply): both arrays are sorted ascending and
  * null-free — the `sort_array(transform(s, xxhash64))` construction
  * guarantees it. Duplicate values count once on each side (matching
  * distinct-set intersection); a null ARRAY yields null. Equality with
  * the string-set intersect holds except on 64-bit hash collisions
  * between two DIFFERENT elements of the same pair's sets
  * (≈ |a|·|b|/2⁶⁴ per pair — immaterial, and RoundThirteenCSpec pins
  * merge-count == string-count on the full x67 corpus).
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_long_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var count = 0L
    while (i < na && j < nb) {
      val va = x.getLong(i); val vb = y.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        count += 1
        while (i < na && x.getLong(i) == va) i += 1
        while (j < nb && y.getLong(j) == vb) j += 1
      }
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val count = ctx.freshName("count")
      s"""
         |final int $na = $x.numElements();
         |final int $nb = $y.numElements();
         |int $i = 0; int $j = 0; long $count = 0L;
         |while ($i < $na && $j < $nb) {
         |  final long $va = $x.getLong($i);
         |  final long $vb = $y.getLong($j);
         |  if ($va < $vb) { $i++; }
         |  else if ($va > $vb) { $j++; }
         |  else {
         |    $count++;
         |    while ($i < $na && $x.getLong($i) == $va) { $i++; }
         |    while ($j < $nb && $y.getLong($j) == $vb) { $j++; }
         |  }
         |}
         |${ev.value} = $count;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}
