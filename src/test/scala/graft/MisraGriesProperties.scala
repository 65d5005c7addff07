package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.MisraGries

/** ScalaCheck laws for the Misra-Gries Aggregator's pure reduce/merge.
  *
  * MG state is order-dependent, so (unlike KMV) merge is NOT required
  * to be exactly commutative/associative on states — the mergeable-
  * summaries guarantee is about the ERROR BOUND. The properties here
  * are the ones partial aggregation actually needs:
  *  - the deficit bound: true_count - reported_count in [0, N/(k+1)]
  *    for every item, under any split of the stream into partitions
  *    merged in any order (the Agarwal et al. 2013 theorem);
  *  - survival: any item with frequency > N/(k+1) is present;
  *  - size: never more than k tracked entries;
  *  - zero identity.
  */
object MisraGriesProperties extends Properties("misra-gries") {

  private val kGen = Gen.chooseNum(1, 8)
  // small alphabet → heavy hitters exist with high probability
  private val vGen = Gen.listOf(Gen.chooseNum(0, 12).map(i => s"u$i"))
  // how to split the stream into partitions: list of cut fractions
  private val splitGen = Gen.chooseNum(1, 5)

  private def runSplit(
      mg: MisraGries, xs: List[String], parts: Int): Map[String, Long] = {
    val chunks =
      if (xs.isEmpty) Seq(xs)
      else xs.grouped(math.max(1, xs.length / parts)).toSeq
    chunks.map(c => c.foldLeft(mg.zero)(mg.reduce))
      .foldLeft(mg.zero)(mg.merge)
  }

  property("deficitBoundUnderAnySplit") = forAll(kGen, vGen, splitGen) {
    (k, xs, parts) =>
      val mg = new MisraGries(k)
      val state = runSplit(mg, xs, parts)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = xs.length.toLong / (k + 1)
      state.forall { case (i, c) =>
        val t = exact.getOrElse(i, 0L)
        c <= t && t - c <= slack
      } && exact.forall { case (i, t) =>
        t - state.getOrElse(i, 0L) <= slack
      }
  }

  property("heavyHittersSurvive") = forAll(kGen, vGen, splitGen) {
    (k, xs, parts) =>
      val mg = new MisraGries(k)
      val state = runSplit(mg, xs, parts)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = xs.length.toLong / (k + 1)
      exact.forall { case (i, t) => t <= slack || state.contains(i) }
  }

  property("atMostKEntries") = forAll(kGen, vGen, splitGen) { (k, xs, parts) =>
    runSplit(new MisraGries(k), xs, parts).size <= k
  }

  property("zeroIsIdentity") = forAll(kGen, vGen) { (k, xs) =>
    val mg = new MisraGries(k)
    val s = xs.foldLeft(mg.zero)(mg.reduce)
    mg.merge(s, mg.zero) == s && mg.merge(mg.zero, s) == s
  }

  property("finishSortsDeterministically") = forAll(kGen, vGen) { (k, xs) =>
    val mg = new MisraGries(k)
    val out = mg.finish(xs.foldLeft(mg.zero)(mg.reduce))
    out == out.sortBy { case (i, c) => (-c, i) }
  }
}
