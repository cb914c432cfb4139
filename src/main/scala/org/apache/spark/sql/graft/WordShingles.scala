package org.apache.spark.sql.graft

import java.util.LinkedHashSet

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array in ONE pass — the
  * native form of `array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', t[i], t[i+1], t[i+2])))`, whose lambdas Spark
  * evaluates interpreted per position with per-call array/string
  * allocations. Here: one loop, one StringBuilder, LinkedHashSet dedup
  * (first-occurrence order, matching `array_distinct`). Fewer than `n`
  * tokens → empty set, as in the HOF form. `CodegenFallback` because
  * the replaced HOF chain is interpreted anyway; the win is the single
  * pass.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n > 0, "shingle size must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val total = toks.numElements()
    val out = new LinkedHashSet[String]()
    if (total >= n) {
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i <= total - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          val t = toks.getUTF8String(i + j)
          if (t != null) sb.append(t.toString)
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
