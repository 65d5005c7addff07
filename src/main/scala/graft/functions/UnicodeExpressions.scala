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

/** Per-letter ('a'..'z') occurrence counts in ONE byte pass — the
  * fused form of the 26 `length(s) − length(replace(s, c, ''))`
  * expressions q114's entropy histogram used (each of those scanned
  * AND re-built the string once per letter: 26 passes + 26
  * allocations per row). Counting bytes is exact for ASCII targets:
  * in UTF-8 the bytes of a multi-byte code point are all ≥ 0x80, so a
  * byte equal to an ASCII letter IS that code point — byte counts
  * equal the code-point counts the length/replace form produced.
  * Returns array<long> of 26 counts, codegen'd via the same
  * static-kernel pattern as [[NfcNormalize]].
  */
case class AsciiLetterHistogram(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "ascii_letter_histogram"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeExpressionsInternal.letterHistogram(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = " +
        s"graft.functions.UnicodeExpressionsInternal.letterHistogram($c);")

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

  def letterHistogram(s: UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val counts = new Array[Long](26)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }
}

object UnicodeFunctions {
  /** NFC-normalize a string column. */
  def nfcNormalize(c: Column): Column =
    shims.column(NfcNormalize(shims.expression(c)))

  /** 26 'a'..'z' counts of a (lowered) string column in one pass. */
  def letterHistogram(c: Column): Column =
    shims.column(AsciiLetterHistogram(shims.expression(c)))
}
