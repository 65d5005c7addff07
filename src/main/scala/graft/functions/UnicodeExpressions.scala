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

/** Count of ASCII letters [A-Za-z] in ONE byte pass — the fused form
  * of `length(regexp_replace(c, "[^A-Za-z]", ""))`, which re-built the
  * whole string per row just to measure it. Byte counting is exact for
  * the same UTF-8 reason as [[AsciiLetterHistogram]].
  */
case class AsciiAlphaCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "ascii_alpha_count"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeExpressionsInternal.alphaCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = " +
        s"graft.functions.UnicodeExpressionsInternal.alphaCount($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of ASCII regex-\s whitespace (space \t \n \x0B \f \r) in one
  * byte pass — the fused form of
  * `length(c) − length(regexp_replace(c, "\\s", ""))`. Java's \s
  * matches exactly these six ASCII characters (no Unicode whitespace
  * without UNICODE_CHARACTER_CLASS), so byte counting reproduces the
  * regex semantics bit-for-bit.
  */
case class AsciiWhitespaceCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "ascii_whitespace_count"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeExpressionsInternal.whitespaceCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = " +
        s"graft.functions.UnicodeExpressionsInternal.whitespaceCount($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeExpressionsInternal {

  def alphaCount(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var c = 0L
    while (i < n) {
      val b = s.getByte(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) c += 1
      i += 1
    }
    c
  }

  def whitespaceCount(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var c = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b == ' ' || (b >= 9 && b <= 13)) c += 1
      i += 1
    }
    c
  }

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

  /** Count of [A-Za-z] characters in one pass. */
  def alphaCount(c: Column): Column =
    shims.column(AsciiAlphaCount(shims.expression(c)))

  /** Count of regex-\s whitespace characters in one pass. */
  def whitespaceCount(c: Column): Column =
    shims.column(AsciiWhitespaceCount(shims.expression(c)))
}
