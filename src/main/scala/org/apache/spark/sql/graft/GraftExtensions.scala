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

  /** Fixed-arity guard: a wrong argument count from SQL surfaces as the
    * standard WRONG_NUM_ARGS AnalysisException naming the function, not
    * an IndexOutOfBoundsException from args(i). */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> n.toString,
            "actualNum" -> args.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"),
          None)
      build(args)
    }

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
      arity("graft_ang2pix", 3)(args =>
        Ang2PixNest(args(0), args(1), intLit(args(2), "nside")))),
    "graft_minhash" -> (
      info("graft_minhash", "graft_minhash(shingles, k) - minhash signature"),
      arity("graft_minhash", 2)(args =>
        MinHashSig(args(0), intLit(args(1), "k")))),
    "graft_simhash" -> (
      info("graft_simhash", "graft_simhash(tokens) - 64-bit simhash"),
      arity("graft_simhash", 1)(args => SimHash64(args(0)))),
    "graft_word_ngrams" -> (
      info("graft_word_ngrams", "graft_word_ngrams(tokens, n) - distinct word n-grams"),
      arity("graft_word_ngrams", 2)(args =>
        WordNGrams(args(0), intLit(args(1), "n")))),
    "graft_sorted_intersect_size" -> (
      info("graft_sorted_intersect_size",
        "graft_sorted_intersect_size(a, b) - |A∩B| of sorted arrays"),
      arity("graft_sorted_intersect_size", 2)(args =>
        SortedIntersectSize(args(0), args(1)))),
    "graft_sorted_long_intersect_size" -> (
      info("graft_sorted_long_intersect_size",
        "graft_sorted_long_intersect_size(a, b) - |A∩B| of sorted long arrays"),
      arity("graft_sorted_long_intersect_size", 2)(args =>
        SortedLongIntersectSize(args(0), args(1)))),
    "graft_cosine" -> (
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of float/double arrays"),
      arity("graft_cosine", 2)(args => FloatVecCosine(args(0), args(1)))),
    "graft_ngram_md5" -> (
      info("graft_ngram_md5",
        "graft_ngram_md5(tokens, n) - positional n-gram md5 fingerprints"),
      arity("graft_ngram_md5", 2)(args =>
        NgramMd5(args(0), intLit(args(1), "n")))),
    "graft_ngram_join" -> (
      info("graft_ngram_join",
        "graft_ngram_join(tokens, n) - positional space-joined n-grams"),
      arity("graft_ngram_join", 2)(args =>
        NgramJoin(args(0), intLit(args(1), "n")))),
    "graft_simhash_md5" -> (
      info("graft_simhash_md5",
        "graft_simhash_md5(tokens) - 32-bit md5-derived simhash"),
      arity("graft_simhash_md5", 1)(args => SimHashMd5(args(0)))),
    "graft_lang_id" -> (
      info("graft_lang_id",
        "graft_lang_id(tokens) - marker-overlap language id"),
      arity("graft_lang_id", 1)(args => LangIdExpr(args(0)))),
    "graft_nfc" -> (
      info("graft_nfc",
        "graft_nfc(str) - Unicode NFC canonical composition"),
      arity("graft_nfc", 1)(args =>
        graft.functions.NfcNormalize(args(0)))),
    "graft_jaro_winkler" -> (
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
      arity("graft_jaro_winkler", 2)(args =>
        graft.functions.JaroWinkler(args(0), args(1)))),
    "graft_hilbert" -> (
      info("graft_hilbert",
        "graft_hilbert(x, y, order) - Hilbert curve distance of (x, y) on the 2^order grid"),
      arity("graft_hilbert", 3)(args =>
        graft.functions.HilbertIndex(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(0), org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(1), org.apache.spark.sql.types.LongType),
          intLit(args(2), "order")))),
    "graft_to_avro" -> (
      info("graft_to_avro", "graft_to_avro(struct) - avro-encode"),
      arity("graft_to_avro", 1)(args => ToAvro(args(0)))),
    "graft_from_avro" -> (
      info("graft_from_avro", "graft_from_avro(bytes, schemaJson) - avro-decode"),
      arity("graft_from_avro", 2)(args =>
        FromAvro(args(0), strLit(args(1), "schemaJson")))))

  /** Register every graft function on a live session. Also registers
    * the typed-Aggregator sketches at their gate arities (UDAFs go
    * through `spark.udf`, not the expression registry): `graft_kmv64`
    * (KMV distinct sketch, k=64 — q145's algebra arity; q136 uses
    * k=5) and `graft_heavy_hitters16` (Misra-Gries, k=16). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, (_, builder)) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    spark.udf.register("graft_kmv64",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.KmvMinHex(64)))
    spark.udf.register("graft_heavy_hitters16",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.MisraGries(16)))
    spark.udf.register("graft_topk8",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.TopKLongPairs(8),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(Long, Long)]()))
  }
}
