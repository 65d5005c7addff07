package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.BpeApply

/** ScalaCheck laws for the pure kernels added in round 9: the
  * interval-stabbing depth used by the layout audits, and BPE
  * train/apply losslessness on arbitrary vocabularies.
  */
object LayoutBpeProperties extends Properties("layout-bpe") {

  // ---- overlapDepth: sweep line vs brute force ----

  private val intervalsGen = Gen.listOf(for {
    a <- Gen.chooseNum(0L, 50L)
    len <- Gen.chooseNum(0L, 20L)
  } yield (a, a + len))

  /** The sweep in RangeLayout.overlapDepth, reproduced on plain pairs
    * (the operator's own input is a DataFrame of file stats). */
  private def sweepDepth(iv: List[(Long, Long)]): Int = {
    val events = iv
      .flatMap { case (lo, hi) => Seq((BigDecimal(lo), 1), (BigDecimal(hi), -1)) }
      .sortBy { case (v, delta) => (v, -delta) }
    var depth = 0; var best = 0
    events.foreach { case (_, d) => depth += d; if (depth > best) best = depth }
    best
  }

  private def bruteDepth(iv: List[(Long, Long)]): Int =
    if (iv.isEmpty) 0
    else iv.flatMap { case (lo, hi) => Seq(lo, hi) }.distinct
      .map(p => iv.count { case (lo, hi) => lo <= p && p <= hi }).max

  property("sweepEqualsBruteForceStabbing") = forAll(intervalsGen) { iv =>
    sweepDepth(iv) == bruteDepth(iv)
  }

  // ---- BPE: lossless + bounded on arbitrary vocabularies ----

  private val wordGen = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val vocabGen = Gen.mapOf(
    wordGen.flatMap(w => Gen.chooseNum(1L, 9L).map(w -> _)))

  property("encodeIsLossless") = forAll(vocabGen, wordGen) { (vocab, w) =>
    val ranks = BpeApply.learnMerges(vocab, 12).zipWithIndex.toMap
    BpeApply.encodeWord(w, ranks).mkString == w
  }

  property("encodeNeverExpands") = forAll(vocabGen, wordGen) { (vocab, w) =>
    val ranks = BpeApply.learnMerges(vocab, 12).zipWithIndex.toMap
    val e = BpeApply.encodeWord(w, ranks)
    e.length <= w.length && (w.isEmpty || e.nonEmpty)
  }

  property("trainedWordsFullyCompressWithEnoughMerges") =
    forAll(Gen.resize(4, vocabGen.suchThat(_.nonEmpty))) { vocab =>
      // enough merges to cover every adjacent pair in the vocabulary
      // (iterator: mapping the key SET would collapse equal budgets)
      val budget = vocab.keysIterator.map(w => math.max(0, w.length - 1)).sum
      val ranks = BpeApply.learnMerges(vocab, budget).zipWithIndex.toMap
      vocab.keys.forall(w => BpeApply.encodeWord(w, ranks).length == 1)
    }
}
