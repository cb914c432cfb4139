package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression —
  * the 10th native expression, filling a genuine built-in gap: Spark
  * SQL ships no normalization function, yet web-crawled training text
  * routinely mixes composed and decomposed forms of the same grapheme
  * ("é" as U+00E9 vs "e"+U+0301), so exact dedup, shingling and token
  * counting all silently fractionate unless the corpus is normalized
  * first (the standard first step of every published pipeline's text
  * cleanup; reference capability surveyed in SURVEY.md §2's
  * text-analysis row). The DuckDB oracle is `nfc_normalize` for the
  * NFC form; the other three forms are spec-pinned against
  * java.text.Normalizer fixtures (x104 + RoundTwelveBSpec).
  *
  * Semantics: exactly `java.text.Normalizer.normalize(s, form)` —
  * the JDK's implementation of Unicode Standard Annex #15, the same
  * annex DuckDB's utf8proc-based `nfc_normalize` implements, so the
  * two engines agree byte-for-byte on the normalized output.
  *
  * Scale shape: a narrow per-row map (no state, no shuffle), codegen'd
  * into the enclosing WholeStageCodegen via a single static call; the
  * fast path inside the JDK (Normalizer.isNormalized-style quick
  * check) makes already-NFC ASCII corpora near-free.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form: $form")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val normalizer = classOf[Normalizer].getName
    val u8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $u8.fromString($normalizer.normalize(
         |  $c.toString(), $normalizer.Form.$form));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
