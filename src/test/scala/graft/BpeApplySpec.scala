package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeApply
import graft.core.Tables

/** BPE train+apply: the Sennrich et al. running example learns the
  * expected early merges, greedy rank-order inference reproduces the
  * canonical segmentations, and the column API is lossless.
  */
class BpeApplySpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("learnMerges reproduces the canonical Sennrich example order") {
    val merges = BpeApply.learnMerges(vocab, 4)
    // counts: (e,s)=9 wins first, then (es,t)=9, then (est ...)
    assert(merges.head === ("e", "s"))
    assert(merges(1) === ("es", "t"))
    // merges are deterministic under map-order permutations
    val again = BpeApply.learnMerges(vocab.toSeq.reverse.toMap, 4)
    assert(merges === again)
  }

  test("greedy encode follows rank order and is lossless") {
    val merges = BpeApply.learnMerges(vocab, 10)
    val ranks = merges.zipWithIndex.toMap
    // trained words compress hard; unseen words still segment
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news")) {
      val enc = BpeApply.encodeWord(w, ranks)
      assert(enc.mkString === w, s"lossless: $w -> $enc")
      assert(enc.length <= w.length)
    }
    // "newest" was the most frequent word: it must collapse fully
    assert(BpeApply.encodeWord("newest", ranks).length === 1)
    // rank order matters: "est" exists, so "lowest" ends ... est
    val lowest = BpeApply.encodeWord("lowest", ranks)
    assert(lowest.last.endsWith("est") || lowest.last == "est",
      s"expected the trained est unit in $lowest")
  }

  test("column API encodes a real corpus losslessly and shuffle-free") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(lower(col("text")))
          .as("toks"))
    // train on the corpus's own vocabulary (driver-side: vocab-bounded)
    val wc = docs.select(explode(col("toks")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = BpeApply.learnMerges(wc, 50)
    val enc = docs.withColumn("sub",
      BpeApply.encodeTokens(col("toks"), merges))
    val p = enc.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"apply must be map-only:\n$p")
    val rows = enc.select(col("toks"), col("sub")).limit(200).collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val sub = r.getSeq[String](1)
      assert(sub.mkString === toks.mkString, "subwords must re-concatenate")
      assert(sub.length <= toks.map(_.length).sum)
      // trained merges actually compress: fewer subwords than chars
      if (toks.nonEmpty) assert(sub.length < toks.map(_.length).sum)
    }
  }
}
