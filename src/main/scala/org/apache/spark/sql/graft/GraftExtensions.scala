package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{Ang2PixNest, FloatVecCosine, LangIdExpr, MinHashSig, NgramJoin, NgramMd5, SimHash64, SimHashMd5, SortedIntersectSize, SortedLongIntersectSize, WordNGrams}
import graft.avro.{FromAvro, ToAvro}

/** SQL surface for the graft expressions, two ways in:
  *
  *  - `GraftExtensions` for `spark.sql.extensions` config (cluster-wide
  *    injection at session build);
  *  - [[GraftExtensions.register]] for an already-running session
  *    (reaches the session FunctionRegistry through the package-private
  *    seam, like the shims).
  *
  * After either, `spark.sql("SELECT graft_ang2pix(ra, dec, 256) ...")`
  * works anywhere DataFrame code does.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val builders: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "graft_ang2pix" -> (
      info("graft_ang2pix", "graft_ang2pix(ra, dec, nside) - healpix nested pixel"),
      (args: Seq[Expression]) =>
        Ang2PixNest(args(0), args(1), intLit(args(2), "nside"))),
    "graft_minhash" -> (
      info("graft_minhash", "graft_minhash(shingles, k) - minhash signature"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "k"))),
    "graft_simhash" -> (
      info("graft_simhash", "graft_simhash(tokens) - 64-bit simhash"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    "graft_word_ngrams" -> (
      info("graft_word_ngrams", "graft_word_ngrams(tokens, n) - distinct word n-grams"),
      (args: Seq[Expression]) => WordNGrams(args(0), intLit(args(1), "n"))),
    "graft_sorted_intersect_size" -> (
      info("graft_sorted_intersect_size",
        "graft_sorted_intersect_size(a, b) - |A∩B| of sorted arrays"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))),
    "graft_sorted_long_intersect_size" -> (
      info("graft_sorted_long_intersect_size",
        "graft_sorted_long_intersect_size(a, b) - |A∩B| of sorted long arrays"),
      (args: Seq[Expression]) => SortedLongIntersectSize(args(0), args(1))),
    "graft_cosine" -> (
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of float/double arrays"),
      (args: Seq[Expression]) => FloatVecCosine(args(0), args(1))),
    "graft_ngram_md5" -> (
      info("graft_ngram_md5",
        "graft_ngram_md5(tokens, n) - positional n-gram md5 fingerprints"),
      (args: Seq[Expression]) => NgramMd5(args(0), intLit(args(1), "n"))),
    "graft_ngram_join" -> (
      info("graft_ngram_join",
        "graft_ngram_join(tokens, n) - positional space-joined n-grams"),
      (args: Seq[Expression]) => NgramJoin(args(0), intLit(args(1), "n"))),
    "graft_simhash_md5" -> (
      info("graft_simhash_md5",
        "graft_simhash_md5(tokens) - 32-bit md5-derived simhash"),
      (args: Seq[Expression]) => SimHashMd5(args(0))),
    "graft_lang_id" -> (
      info("graft_lang_id",
        "graft_lang_id(tokens) - marker-overlap language id"),
      (args: Seq[Expression]) => LangIdExpr(args(0))),
    "graft_to_avro" -> (
      info("graft_to_avro", "graft_to_avro(struct) - avro-encode"),
      (args: Seq[Expression]) => ToAvro(args(0))),
    "graft_from_avro" -> (
      info("graft_from_avro", "graft_from_avro(bytes, schemaJson) - avro-decode"),
      (args: Seq[Expression]) =>
        FromAvro(args(0), strLit(args(1), "schemaJson"))))

  /** Register every graft function on a live session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, (_, builder)) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
