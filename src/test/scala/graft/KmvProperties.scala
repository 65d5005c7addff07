package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.KmvMinHex

/** ScalaCheck laws for the KMV Aggregator's pure reduce/merge (no
  * Spark session): the properties Spark's partial aggregation relies
  * on — commutative/associative merge with a zero identity — plus the
  * sketch's defining equality with the exact sorted-distinct-take-k.
  */
object KmvProperties extends Properties("kmv") {

  private val kGen = Gen.chooseNum(1, 8)
  // md5-like values: short hex strings; duplicates likely by design
  private val vGen = Gen.listOf(Gen.chooseNum(0, 40)
    .map(i => f"${i}%08x"))

  private def sketch(kmv: KmvMinHex, xs: Seq[String]): Seq[String] =
    xs.foldLeft(kmv.zero)(kmv.reduce)

  property("equalsSortedDistinctTakeK") = forAll(kGen, vGen) { (k, xs) =>
    sketch(new KmvMinHex(k), xs) == xs.distinct.sorted.take(k)
  }

  property("mergeCommutative") = forAll(kGen, vGen, vGen) { (k, a, b) =>
    val kmv = new KmvMinHex(k)
    kmv.merge(sketch(kmv, a), sketch(kmv, b)) ==
      kmv.merge(sketch(kmv, b), sketch(kmv, a))
  }

  property("mergeAssociative") = forAll(kGen, vGen, vGen, vGen) { (k, a, b, c) =>
    val kmv = new KmvMinHex(k)
    val (sa, sb, sc) = (sketch(kmv, a), sketch(kmv, b), sketch(kmv, c))
    kmv.merge(kmv.merge(sa, sb), sc) == kmv.merge(sa, kmv.merge(sb, sc))
  }

  property("zeroIsIdentity") = forAll(kGen, vGen) { (k, xs) =>
    val kmv = new KmvMinHex(k)
    val s = sketch(kmv, xs)
    kmv.merge(s, kmv.zero) == s && kmv.merge(kmv.zero, s) == s
  }

  property("mergeEqualsUnionSketch") = forAll(kGen, vGen, vGen) { (k, a, b) =>
    val kmv = new KmvMinHex(k)
    kmv.merge(sketch(kmv, a), sketch(kmv, b)) == sketch(kmv, a ++ b)
  }
}
