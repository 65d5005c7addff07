package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomSketchInternal, BloomBuild}
import graft.operators.BloomJoin

/** Bloom runtime-filter contract: no false negatives (the property the
  * q197 oracle leans on), mergeable build buffers, a bounded false
  * positive rate, and the plan shape that gives the operator its value
  * at scale — the membership predicate sits on the probe side BELOW the
  * join exchange.
  */
class BloomKernelSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("no false negatives: every inserted hash tests true") {
    val bm = new Array[Byte](1 << 11) // 2^14 bits
    val hashes = Array.fill(2000)(rnd.nextLong())
    hashes.foreach(BloomSketchInternal.insert(bm, _, 4))
    assert(hashes.forall(BloomSketchInternal.mightContain(bm, _, 4)))
  }

  test("false positive rate stays near theory at 16 bits/key") {
    val bm = new Array[Byte](1 << 11) // 16384 bits
    val members = Array.fill(1024)(rnd.nextLong()) // 16 bits/key
    members.foreach(BloomSketchInternal.insert(bm, _, 4))
    val memberSet = members.toSet
    val probes = Array.fill(20000)(rnd.nextLong()).filterNot(memberSet)
    val fp = probes.count(BloomSketchInternal.mightContain(bm, _, 4))
    // theory: (1 - e^(-kn/m))^k ≈ 0.24% at k=4, 16 bits/key; allow 5x
    assert(fp.toDouble / probes.length < 0.012,
      s"FPR ${fp.toDouble / probes.length}")
  }

  test("merge is bitwise OR: merged filter contains both sides") {
    val agg = new BloomBuild(1 << 14, 4)
    val a = Array.fill(500)(rnd.nextLong())
    val b = Array.fill(500)(rnd.nextLong())
    val bmA = a.foldLeft(agg.zero)(agg.reduce)
    val bmB = b.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(bmA, bmB)
    assert((a ++ b).forall(BloomSketchInternal.mightContain(merged, _, 4)))
    // commutativity on fresh copies
    val bmA2 = a.foldLeft(agg.zero)(agg.reduce)
    val bmB2 = b.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(bmB2, bmA2).toSeq == merged.toSeq)
  }
}

class BloomJoinSpec extends SparkTestBase {

  test("prefilter + exact join returns exactly the plain join's rows") {
    import spark.implicits._
    val build = (1 to 200).map(i => (i * 7L, s"b$i")).toDF("key", "bval")
    val probe =
      (1 to 5000).map(i => (i.toLong, i % 13)).toDF("key", "pval")
    val pruned =
      BloomJoin.prefilter(probe, col("key"), build, col("key"),
        numBits = 1 << 14)
    val got = pruned.join(build, "key").select("key", "pval", "bval")
    val want = probe.join(build, "key").select("key", "pval", "bval")
    assert(got.collect().toSet == want.collect().toSet)
    // and the prefilter actually pruned: ≤ members + fp slack
    assert(pruned.count() <= 200 + 50)
  }

  test("membership predicate sits on the probe side below the exchange") {
    // parquet-backed sides: a local relation would let the optimizer
    // evaluate the filter at plan time and hide the shape under test
    val build = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val probe = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val pruned =
        BloomJoin.prefilter(probe, col("l_orderkey"), build, col("o_orderkey"))
      val joined =
        pruned.join(build, pruned("l_orderkey") === build("o_orderkey"))
      val plan = formattedPlan(joined)
      val filterAt = plan.indexOf("bloom_might_contain")
      assert(filterAt >= 0, plan)
      // plans print top-down: the probe-side predicate must sit DEEPER
      // in the tree (printed after) than the exchange it shrinks
      val exchangeAt = plan.indexOf("Exchange")
      assert(exchangeAt >= 0 && exchangeAt < filterAt, plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
