package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.RangeLayout
import graft.core.Tables

/** Range-sorted layout: files cover disjoint value ranges (depth 1),
  * while a round-robin layout of the same data interleaves every file
  * across the full domain — the contrast that proves the range shuffle
  * is load-bearing, not just the sort.
  */
class RangeLayoutSpec extends SparkTestBase {

  test("writeSorted yields disjoint per-file ranges; round-robin does not") {
    val events = Tables.t(spark, sf, "events").select("event_id", "ts")
    val n = 8

    val sorted = Files.createTempDirectory("graft_range_").toString
    RangeLayout.writeSorted(events, "ts", n, sorted)
    val sortedStats = RangeLayout.fileStats(spark, sorted, "ts")
    val files = sortedStats.count()
    assert(files >= 2, s"expected multiple files, got $files")
    assert(RangeLayout.overlapDepth(sortedStats) === 1)

    // total rows survive the layout change
    val total = events.count()
    assert(
      sortedStats.agg(sum("n_rows")).head().getLong(0) === total)

    // contrast: round-robin repartition spreads the domain across
    // every file — depth collapses to ~fileCount
    val rr = Files.createTempDirectory("graft_rr_").toString
    events.repartition(n).write.mode("overwrite").parquet(rr)
    val rrStats = RangeLayout.fileStats(spark, rr, "ts")
    assert(RangeLayout.overlapDepth(rrStats) >= n - 1)
  }

  test("z-ordered write bounds BOTH dimensions; 1-D sort spans the second") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val dom2 = li.agg(max("l_suppkey")).head().getLong(0) + 1

    val zdir = Files.createTempDirectory("graft_z_").toString
    RangeLayout.writeZOrdered(li, "l_partkey", "l_suppkey", 10, 8, zdir)
    val oneDir = Files.createTempDirectory("graft_1d_").toString
    RangeLayout.writeSorted(li, "l_partkey", 8, oneDir)

    def meanSuppExtent(dir: String): Double = {
      val boxes = RangeLayout.boxStats(spark, dir, "l_partkey", "l_suppkey")
        .collect()
      boxes.map(r => (r.getAs[Long]("max_2") - r.getAs[Long]("min_2") + 1)
        .toDouble / dom2).sum / boxes.length
    }
    val z = meanSuppExtent(zdir)
    val one = meanSuppExtent(oneDir)
    // the partkey-sorted layout cannot know about suppkey — its files
    // span (almost) the whole second domain; z-order halves it or better
    assert(one > 0.9, s"1-D layout unexpectedly bounded dim 2: $one")
    assert(z < one / 2, s"z-order must bound dim 2: z=$z vs 1d=$one")
    // row conservation
    val total = li.count()
    assert(RangeLayout.boxStats(spark, zdir, "l_partkey", "l_suppkey")
      .agg(sum("n_rows")).head().getLong(0) === total)
  }

  test("a range predicate on the sorted layout touches a bounded file set") {
    val events = Tables.t(spark, sf, "events").select("event_id", "ts")
    val dir = Files.createTempDirectory("graft_range_q_").toString
    RangeLayout.writeSorted(events, "ts", 8, dir)
    val stats = RangeLayout.fileStats(spark, dir, "ts").collect()
    // probe the median ts: with depth-1 files exactly one file's
    // [min,max] interval can contain an interior point
    val probe = events.stat.approxQuantile("ts", Array(0.5), 0.01)(0).toLong
    val touching = stats.count(r =>
      r.getAs[Long]("min_v") <= probe && probe <= r.getAs[Long]("max_v"))
    assert(touching <= 2, s"median point stabbed $touching files")
  }
}
