package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable-domain (eTLD+1) extraction against the bundled real
  * public-suffix list ([[graft.ext.Psl]]) as a native expression — the
  * 12th native expression (round-16, verdict task #5). A literal-map
  * probe can't express the PSL algorithm (longest-match over 7,380
  * rules with wildcard and exception precedence), and a Literal
  * MapType probe is a LINEAR key scan per lookup in Spark — so the
  * rule sets live in per-JVM hash sets and the expression compiles to
  * one static call inside whole-stage codegen: a narrow per-row map,
  * no shuffle, no UDF/serialization boundary.
  *
  * Semantics (shared with the x133 oracle SQL, which evaluates the
  * same algorithm over the same rules injected as a literal table):
  * exception > most-labels > implicit `*`; etld1 = public suffix + 1
  * label; a host that is itself a public suffix returns unchanged.
  * Input is expected lowercased ([[graft.ext.Url.host]] lowercases).
  */
case class PslEtld1(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "psl_etld1"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.ext.Psl.etld1(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $u8.fromString(" +
        s"graft.ext.Psl.etld1($c.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): PslEtld1 =
    copy(child = newChild)
}
