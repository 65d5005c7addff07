package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity (Jaro 1989; Winkler 1990) — the
  * fuzzy-matching kernel for entity resolution / typo-pair detection
  * that Spark lacks (it ships only `levenshtein` and `soundex`).
  *
  * Semantics are pinned BIT-FOR-BIT to DuckDB's
  * `jaro_winkler_similarity` (verified against 4000 seeded random
  * pairs plus the published Winkler examples during development, and
  * continuously by q298's oracle):
  *
  *  - either side empty → 0.0 (also for BOTH empty — the DuckDB
  *    convention, where some libraries return 1.0);
  *  - match window `max(0, max(|a|,|b|)/2 − 1)`; greedy left-to-right
  *    matcher taking the first unused candidate in the window;
  *  - transpositions `t` = half the positional mismatches between the
  *    matched subsequences (integer floor);
  *  - `jaro = (m/|a| + m/|b| + (m−t)/m) / 3` — exactly this
  *    expression tree: +, ×, ÷ are IEEE correctly-rounded, so any
  *    engine computing the same tree over the same integers yields
  *    identical bits;
  *  - Winkler boost only when `jaro > 0.7`:
  *    `jaro + ℓ·0.1·(1−jaro)`, common-prefix ℓ capped at 4.
  *
  * Unicode seam: comparison is per UTF-16 char of the decoded string —
  * identical to codepoint semantics for ASCII and the BMP; callers
  * matching astral-plane text should normalize first (cf. `graft_nfc`).
  */
object StringSimilarityInternal {

  def jaroWinkler(au: UTF8String, bu: UTF8String): Double = {
    val s1 = au.toString
    val s2 = bu.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val used = new Array[Boolean](l2)
    // matched a-positions in a-order; b-order is recovered from used[]
    val aPos = new Array[Int](math.min(l1, l2))
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!used(j) && s2.charAt(j) == c) {
          used(j) = true; aPos(m) = i; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var tr = 0
    var k = 0
    var j = 0
    while (j < l2) {
      if (used(j)) {
        if (s2.charAt(j) != s1.charAt(aPos(k))) tr += 1
        k += 1
      }
      j += 1
    }
    val t = tr / 2
    val md = m.toDouble
    var jaro = (md / l1 + md / l2 + (md - t) / md) / 3
    if (jaro > 0.7) {
      val maxp = math.min(4, math.min(l1, l2))
      var pl = 0
      while (pl < maxp && s1.charAt(pl) == s2.charAt(pl)) pl += 1
      jaro = jaro + pl * 0.1 * (1 - jaro)
    }
    jaro
  }
}

/** `jaro_winkler(a, b)` as a codegen'd Catalyst expression — the
  * typo-pair verify kernel stays inside WholeStageCodegen next to the
  * blocked self-join that feeds it (q298), instead of falling out to
  * a Scala UDF with per-row encoder traffic.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarityInternal.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = " +
        s"graft.functions.StringSimilarityInternal.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column form of [[JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    shims.column(JaroWinkler(shims.expression(a), shims.expression(b)))
}
