package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a broadcast Bloom filter of join keys
  * (SURVEY.md §2k X19) — the pre-shuffle pruning half of
  * [[graft.ops.BloomPrune]].
  *
  * The sketch travels as a `Broadcast[Array[Byte]]` handle, not as
  * bytes embedded in the expression tree: the serialized task closure
  * stays small however large the filter is (a 100M-key / 1% filter is
  * ~120 MB — embedding it per-task would be shipped with every
  * scheduled task; broadcast ships it once per executor). Deserialized
  * lazily once per executor thread via the transient lazy val.
  *
  * `CodegenFallback`: the probe is two xxhash-style hashes + two bit
  * reads per row against a long-lived heap object — the virtual-call
  * overhead is noise next to the scan it prunes, and the surrounding
  * filter stays inside whole-stage codegen.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[Array[Byte]])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloom.value))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
