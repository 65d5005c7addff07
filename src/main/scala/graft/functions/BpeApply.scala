package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Byte-pair-encoding train + apply (Sennrich et al. 2016) — the
  * inference half of the tokenizer family: q60 is the regex
  * pretokenizer, q103 counts merge candidates distributed; this
  * kernel LEARNS an ordered merge list from a word-count vocabulary
  * and APPLIES it greedily (lowest-rank adjacent pair first, the
  * reference BPE inference loop).
  *
  * Scale split, mirroring q103's insight: training iterates over the
  * VOCABULARY (word types × counts — vocabulary-bounded, Heaps-law
  * sublinear), so it is a driver-side step fed by one distributed
  * wordcount; application is pure per-row work against the broadcast
  * merge table — shuffle-free at any corpus size.
  */
object BpeApply {

  type Merge = (String, String)

  /** Learn `nMerges` merges from a word→count vocabulary. Ties break
    * deterministically: count descending, then pair lexicographic —
    * so the learned table is reproducible on any engine/partitioning.
    */
  def learnMerges(wordCounts: Map[String, Long], nMerges: Int): Seq[Merge] = {
    var vocab: Map[Seq[String], Long] =
      wordCounts.map { case (w, c) => (w.map(_.toString): Seq[String]) -> c }
    val merges = Seq.newBuilder[Merge]
    var done = 0
    while (done < nMerges) {
      val pairCounts = collection.mutable.Map.empty[Merge, Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) =>
            val k = (a, b)
            pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          case _ =>
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val best = pairCounts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      vocab = vocab.map { case (syms, c) => (mergeOnce(syms, best), c) }
      done += 1
    }
    merges.result()
  }

  private def mergeOnce(syms: Seq[String], m: Merge): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy encode: repeatedly merge the adjacent pair with the LOWEST
    * rank until none applies — the canonical BPE inference order
    * (NOT first-to-last scan order; rank order is what training
    * frequency justified). */
  def encodeWord(word: String, ranks: Map[Merge, Int]): Seq[String] = {
    if (word.isEmpty) return Nil
    var syms: Seq[String] = word.map(_.toString)
    var go = true
    while (go && syms.length > 1) {
      var best: Option[(Int, Merge)] = None
      syms.sliding(2).foreach {
        case Seq(a, b) =>
          ranks.get((a, b)).foreach { r =>
            if (best.forall(_._1 > r)) best = Some((r, (a, b)))
          }
        case _ =>
      }
      best match {
        case Some((_, m)) => syms = mergeOnce(syms, m)
        case None => go = false
      }
    }
    syms
  }

  /** Column API: encode an array<string> token column into the
    * flattened subword array. The rank map broadcasts inside the udf
    * closure — per-row work only, no shuffle at any corpus size. */
  def encodeTokens(tokens: Column, merges: Seq[Merge]): Column = {
    val ranks = merges.zipWithIndex.toMap
    val enc = udf { (toks: Seq[String]) =>
      if (toks == null) null
      else toks.flatMap(t => encodeWord(t, ranks))
    }
    enc(tokens)
  }
}
