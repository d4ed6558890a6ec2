package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen'd
  * expression — the first pass of corpus text normalization (composed
  * accents, compatibility singletons like U+2126 OHM SIGN → U+03A9).
  * Spark has no built-in; a Scala UDF would break whole-stage codegen
  * on a pass that runs over EVERY document of a 100 TB corpus.
  *
  * Fast path: `isFullAscii` bytes pass through untouched (NFC is the
  * identity on ASCII) — the overwhelmingly common case pays one byte
  * scan and zero allocation; only genuinely non-ASCII rows take the
  * String round-trip through java.text.Normalizer. Cross-engine: JDK
  * NFC and DuckDB's utf8proc nfc_normalize agree codepoint-for-
  * codepoint (verified over composed/decomposed accents, singletons,
  * Hangul composition — both implement Unicode canonical composition).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  def ofColumn(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))
}
