package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frozen-rule BPE encode in ONE expression — the native form of
  * graft.ext.BpeMerge.encodeFrozen, which folds k merge rules into k
  * nested filter/transform rewrites: at k = 3 that is fine, at a
  * production vocabulary (k ≈ 30k) the composed Catalyst plan is 30k
  * expression layers deep — unanalyzable long before it is slow. Here
  * the rule list is plain expression state (k·2 strings, serialized
  * once per task binary) and each document is encoded by k in-memory
  * left-to-right greedy passes over its token array — O(k·len) with
  * zero plan depth, the CdcBoundaries precedent applied to the
  * tokenizer hot path (round-12; SCALE-BPENATIVE carries the A/B and
  * the depth wall receipt).
  *
  * Semantics: each pass merges GREEDILY left to right — at position i,
  * if (t[i], t[i+1]) equals the rule, emit `a_b` and consume both.
  * For a ≠ b rules occurrences cannot overlap, so this equals the
  * match-all rewrite of BpeMerge.rewriteToks exactly; for a == b
  * rules it IS the left-greedy run rule real BPE uses (floor(L/2)
  * merges per maximal run, lone trailing token when L is odd) — i.e.
  * the expression coincides with encodeFrozen(allowIdentical = true)
  * on every input, and with the allowIdentical = false form on every
  * rule that trainer can produce (it never emits identical halves).
  * RoundTwelveSpec pins bit-equality on trained rules, the
  * identical-halves fixture, and the empty rule list (identity).
  */
case class BpeEncodeRules(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode_rules"

  // (a, b, a_b) resolved to UTF8String once per task
  @transient private lazy val ruleU: Array[Array[UTF8String]] =
    rules.map { case (a, b) =>
      Array(UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + "_" + b))
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var toks = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < toks.length) { toks(i) = arr.getUTF8String(i); i += 1 }
    var r = 0
    while (r < ruleU.length) {
      val a = ruleU(r)(0); val b = ruleU(r)(1); val ab = ruleU(r)(2)
      val n = toks.length
      val out = new Array[UTF8String](n)
      var oi = 0
      var ii = 0
      var changed = false
      while (ii < n) {
        if (ii + 1 < n && a.equals(toks(ii)) && b.equals(toks(ii + 1))) {
          out(oi) = ab; oi += 1; ii += 2; changed = true
        } else {
          out(oi) = toks(ii); oi += 1; ii += 1
        }
      }
      if (changed) toks = java.util.Arrays.copyOf(out, oi)
      r += 1
    }
    val res = new Array[Any](toks.length)
    var k = 0
    while (k < toks.length) { res(k) = toks(k); k += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeRules = copy(child = newChild)
}
