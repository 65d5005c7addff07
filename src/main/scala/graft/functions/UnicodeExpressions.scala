package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression.
  *
  * Spark ships no normalization function, yet un-normalized text is a
  * classic corpus-dedup leak: "é" (U+00E9) and "e"+COMBINING ACUTE
  * (U+0065 U+0301) are different byte strings with identical rendering,
  * so exact/MinHash dedup silently misses such pairs and tokenizers
  * split them differently. NFC canonical composition (java.text
  * .Normalizer — the JDK's implementation of UAX #15, the same
  * standard behind DuckDB's `nfc_normalize`, which q279's oracle uses
  * as the cross-engine check) collapses them.
  *
  * Codegen calls the same static kernel as eval, keeping the
  * normalization inside WholeStageCodegen; the fast path skips the
  * Normalizer entirely for pure-ASCII rows (the overwhelmingly common
  * case in a crawled corpus — isNormalized is O(n) with no alloc).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeExpressionsInternal.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeExpressionsInternal.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeExpressionsInternal {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object UnicodeFunctions {
  /** NFC-normalize a string column. */
  def nfcNormalize(c: Column): Column =
    shims.column(NfcNormalize(shims.expression(c)))
}
