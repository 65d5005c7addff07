package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalOverlap

/** Interval-overlap join: exact pair semantics on planted geometry
  * (touching endpoints are NOT overlaps under half-open intervals,
  * multi-bin spans dedupe to one pair) and the plan shape the operator
  * exists for — an equi-join on the bin key, never a nested loop over
  * the inequality predicate.
  */
class IntervalOverlapSpec extends SparkTestBase {

  test("planted geometry: exact pairs, half-open endpoints, dedupe") {
    import spark.implicits._
    // bins of width 10
    val a = Seq(
      (1L, 0L, 5L),    // inside bin 0
      (2L, 8L, 23L),   // spans bins 0-2 (multi-bin: dedupe check)
      (3L, 30L, 40L)   // touches b4 at 40 — half-open, NO overlap
    ).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, 3L, 9L),   // overlaps a1 [3,5) and a2 [8,9)
      (20L, 15L, 22L), // overlaps a2 [15,22) — same pair via 2 bins
      (30L, 25L, 30L), // gap — no overlap
      (40L, 40L, 50L)  // starts exactly at a3's end — no overlap
    ).toDF("b_id", "b_s", "b_e")
    val got = IntervalOverlap.pairs(a, b, binUs = 10L)
      .select("a_id", "b_id", "overlap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, 10L, 2L), (2L, 10L, 1L), (2L, 20L, 7L)))
  }

  test("agrees with the brute-force inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val a = (1 to 200).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(60))
    }.toDF("a_id", "a_s", "a_e")
    val b = (1 to 150).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(40))
    }.toDF("b_id", "b_s", "b_e")
    val got = IntervalOverlap.pairs(a, b, binUs = 32L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = a.join(b,
        greatest(col("a_s"), col("b_s")) < least(col("a_e"), col("b_e")))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("plans an equi-join on the bin, never a nested loop") {
    val ev = graft.core.Tables.t(spark, sf, "events")
    val sess = ev.selectExpr("user_id as a_id", "ts as a_s",
      "ts + 1000000 as a_e")
    val inc = ev.selectExpr("event_id as b_id", "ts as b_s",
      "ts + 500000 as b_e")
    val plan = formattedPlan(IntervalOverlap.pairs(sess, inc, 3600000000L))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"inequality predicate leaked into the join:\n$plan")
  }
}
