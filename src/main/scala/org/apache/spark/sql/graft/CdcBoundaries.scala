package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries in ONE O(len) pass — the native
  * form of graft.ext.ContentChunks.boundariesHof, whose per-position w-term
  * polynomial re-fold is O(len·w) in interpreted HOF lambdas. Here the
  * window hash rolls: h_i = ((h_{i−1} − code_{i−w}·B^{w−1})·B +
  * code_i) mod M — algebraically identical mod M to the re-folded
  * polynomial, so the boundary set is bit-identical to the HOF form
  * and to the DuckDB oracle (RoundElevenBSpec pins native == HOF on
  * real documents). Characters are Unicode code points, matching
  * SQL ascii(substr(text, j, 1)).
  *
  * Output: ascending 1-based positions i ∈ [w, len] where
  * hash_i % mask == 0; fewer than w characters → empty (the caller
  * treats the whole document as one chunk).
  */
case class CdcBoundaries(child: Expression, w: Int, b: Long, m: Long,
    mask: Long)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(w > 0 && b > 0 && m > 1 && mask > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_boundaries"

  // B^{w-1} mod M, for evicting the outgoing character
  private val bPowW1: Long =
    java.math.BigInteger.valueOf(b).modPow(
      java.math.BigInteger.valueOf(w - 1L),
      java.math.BigInteger.valueOf(m)).longValueExact()

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    val out = new java.util.ArrayList[Integer]()
    if (len >= w) {
      // prime the first window
      var h = 0L
      var j = 0
      while (j < w) { h = (h * b + cps(j)) % m; j += 1 }
      if (h % mask == 0) out.add(w)
      var i = w
      while (i < len) {
        // evict cps(i-w), admit cps(i); keep h in [0, m)
        h = (h - (cps(i - w) % m) * bPowW1 % m + m) % m
        h = (h * b + cps(i)) % m
        if (h % mask == 0) out.add(i + 1)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) { arr(k) = out.get(k).intValue(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}
