package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixScan

/** The two-level distributed scan must equal a single-partition window
  * row for row — and must never PLAN a single-partition window.
  */
class PrefixScanSpec extends SparkTestBase {

  private def refScan(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("cum_ref", sum(col("v")).over(
      Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  test("banded scan == global window, duplicates and negatives included") {
    import spark.implicits._
    // heavy duplication ensures band boundaries split between runs of
    // equal keys; negative values exercise non-monotone prefixes
    val rows = (1 to 997).map { i =>
      (i.toLong, (i % 13).toLong, ((i * 7919) % 101 - 50).toLong)
    }
    val df = rows.toDF("id", "k", "v")
    val got = PrefixScan.runningSum(df, "k", Seq("id"), "v", "cum",
        nBands = 8)
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = refScan(df).select("id", "cum_ref").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("single-row, single-band-degenerate, and all-equal-keys inputs") {
    import spark.implicits._
    val one = Seq((1L, 5L, 42L)).toDF("id", "k", "v")
    assert(PrefixScan.runningSum(one, "k", Seq("id"), "v", "cum")
      .select("cum").head().getLong(0) == 42L)
    // all keys equal: every row lands in ONE band (disc cuts all equal
    // the key) — still correct, just unbalanced, like any skewed key
    val flat = (1 to 50).map(i => (i.toLong, 7L, 1L)).toDF("id", "k", "v")
    val cums = PrefixScan.runningSum(flat, "k", Seq("id"), "v", "cum",
        nBands = 4)
      .orderBy("id").select("cum").collect().map(_.getLong(0))
    assert(cums.toSeq == (1L to 50L))
  }

  test("randomized: banded == global across seeds, sizes, band counts") {
    import graft.operators.PrefixScan
    import spark.implicits._
    for (seed <- Seq(7, 42, 1337); nBands <- Seq(2, 5, 16)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(400)
      // keys drawn from a SMALL domain to force heavy duplication at
      // band boundaries; values span negatives
      val rows = (1 to n).map { i =>
        (i.toLong, rnd.nextInt(20).toLong, (rnd.nextInt(199) - 99).toLong)
      }
      val df = rows.toDF("id", "k", "v")
      val got = PrefixScan.runningSum(df, "k", Seq("id"), "v", "cum",
          nBands = nBands)
        .select("id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = refScan(df).select("id", "cum_ref").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref, s"seed=$seed nBands=$nBands n=$n diverged")
    }
  }

  test("runningSums: N columns in one pass, each equal to its own scan") {
    import graft.operators.PrefixScan
    import spark.implicits._
    val df = (1 to 300).map { i =>
      (i.toLong, (i % 11).toLong, (i % 7).toLong, ((i * 13) % 5).toLong)
    }.toDF("id", "k", "v1", "v2")
    val multi = PrefixScan.runningSums(df, "k", Seq("id"),
        Seq("v1" -> "c1", "v2" -> "c2"), nBands = 4)
      .select("id", "c1", "c2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val s1 = PrefixScan.runningSum(df, "k", Seq("id"), "v1", "c1",
        nBands = 4)
      .select("id", "c1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = PrefixScan.runningSum(df, "k", Seq("id"), "v2", "c2",
        nBands = 4)
      .select("id", "c2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi.view.mapValues(_._1).toMap == s1)
    assert(multi.view.mapValues(_._2).toMap == s2)
  }

  test("plans NO unpartitioned window; bands bound the offset table") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 500).map(i => (i.toLong, (i % 17).toLong, 1L))
      .toDF("id", "k", "v")
    val out = PrefixScan.runningSum(df, "k", Seq("id"), "v", "cum",
      nBands = 8)
    val bad = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "PrefixScan planned a single-partition window")
    val bands = out.select("scan_band").distinct().count()
    assert(bands <= 8L)
  }
}
