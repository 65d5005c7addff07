package graft

import org.apache.spark.sql.functions._

import graft.operators.DistributedSelect

/** Distributed selection: the histogram-narrowing k-th order statistic
  * must equal the sort-based answer on every k, including duplicates,
  * negatives, skew, and single-bin degeneracies.
  */
class DistributedSelectSpec extends SparkTestBase {
  import spark.implicits._

  private def check(vals: Seq[Long], ks: Seq[Long]): Unit = {
    val df = vals.toDF("v")
    val sorted = vals.sorted
    ks.foreach { k =>
      val got = DistributedSelect.kthSmallest(df, col("v"), k)
      assert(got === sorted((k - 1).toInt),
        s"k=$k over ${vals.take(20)}...: got $got")
    }
  }

  test("matches sort on duplicates, negatives, and extremes") {
    check(Seq(5L, -3L, 5L, 0L, 7L, -3L, 5L),
      1L to 7L)
    // wide span: values spread across many histogram widths
    check(Seq(Long.MinValue / 2, -1L, 0L, 1L, Long.MaxValue / 2, 42L),
      1L to 6L)
    // constant column: lo == hi immediately
    check(Seq.fill(10)(9L), Seq(1L, 5L, 10L))
  }

  test("pseudo-random property sweep: every k equals the sorted answer") {
    // deterministic LCG so the sweep is reproducible
    var x = 0x2545F4914F6CDD1DL
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val vals = Seq.fill(500)(next() % 10000)
    val sorted = vals.sorted
    val df = vals.toDF("v").repartition(8)
    Seq(1L, 2L, 17L, 250L, 251L, 499L, 500L).foreach { k =>
      assert(DistributedSelect.kthSmallest(df, col("v"), k)
        === sorted((k - 1).toInt), s"k=$k")
    }
  }

  test("multi-k shares passes and equals per-k answers") {
    var x = 77L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val vals = Seq.fill(400)(next() % 100000)
    val sorted = vals.sorted
    val df = vals.toDF("v").repartition(4)
    val ks = Seq(1L, 50L, 50L, 123L, 200L, 399L, 400L) // dup k allowed
    val got = DistributedSelect.kthSmallestMulti(df, col("v"), ks)
    assert(got === ks.map(k => sorted((k - 1).toInt)),
      s"multi-k must equal the sorted answers: $got")
  }

  test("bounds are enforced") {
    val df = Seq(1L, 2L).toDF("v")
    intercept[IllegalArgumentException] {
      DistributedSelect.kthSmallest(df, col("v"), 0L)
    }
    intercept[IllegalArgumentException] {
      DistributedSelect.kthSmallest(df, col("v"), 3L)
    }
  }
}
