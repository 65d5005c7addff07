package graft

import org.apache.spark.sql.functions._

import graft.operators.PrefixFilterJoin

/** Prefix-filter exact set-similarity join: completeness and exactness
  * against an all-pairs brute force (the operator's whole claim is
  * "identical result, never a quadratic plan"), integer threshold
  * boundary behavior, and the candidate-generation plan shape.
  */
class PrefixFilterJoinSpec extends SparkTestBase {

  private def brute(sets: Seq[(Long, Set[String])], p: Int, q: Int) =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; uni = (sa | sb).size
      if inter * q >= uni * p
    } yield (ia, ib, inter, sa.size, sb.size)).toSet

  private def run(sets: Seq[(Long, Set[String])], p: Int, q: Int) = {
    import spark.implicits._
    val df = sets.map { case (i, s) => (i, s.toArray) }.toDF("id", "toks")
    PrefixFilterJoin.selfJoin(df, p, q)
      .select("id_a", "id_b", "inter", "size_a", "size_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
  }

  test("equals brute force on seeded random sets, three thresholds") {
    // small vocabulary forces heavy overlap, so pairs straddle every
    // threshold; sizes 1..12 exercise the ceil prefix-length math
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => s"t$i")
      val sets = (1L to 80L).map { i =>
        i -> rnd.shuffle(vocab).take(1 + rnd.nextInt(12)).toSet
      }
      for ((p, q) <- Seq((1, 2), (2, 3), (4, 5)))
        assert(run(sets, p, q) === brute(sets, p, q),
          s"seed=$seed threshold=$p/$q")
    }
  }

  test("threshold boundary is exact: J == p/q kept, one-off dropped") {
    // {a,b,c,d} vs {a,b,c,e}: inter 3, union 5 — J = 3/5 exactly
    val sets = Seq(
      1L -> Set("a", "b", "c", "d"),
      2L -> Set("a", "b", "c", "e"))
    assert(run(sets, 3, 5).map(t => (t._1, t._2)) === Set((1L, 2L)))
    // strictly above 3/5 excludes it (no float wobble at the boundary)
    assert(run(sets, 61, 100) === Set.empty)
    // identical sets found at threshold 1/1 (prefix length >= 1 always)
    val dup = Seq(1L -> Set("x", "y"), 2L -> Set("x", "y"))
    assert(run(dup, 1, 1).map(t => (t._1, t._2)) === Set((1L, 2L)))
  }

  test("finds cross-block pairs a blocking heuristic would miss") {
    // two near-identical sets that share no cheap blocking key (first
    // char, size parity…) — global prefix filtering still pairs them
    val sets = Seq(
      1L -> Set("alpha", "beta", "gamma", "delta", "epsilon"),
      2L -> Set("alpha", "beta", "gamma", "delta", "zeta"),
      3L -> Set("unrelated", "tokens", "here"))
    assert(run(sets, 2, 3).map(t => (t._1, t._2)) === Set((1L, 2L)))
  }

  test("plans equi-joins only: no cartesian, no nested loop") {
    import spark.implicits._
    val docs = graft.core.Tables.t(spark, sf, "documents")
      .select(col("doc_id").as("id"),
        array_distinct(split(trim(col("text")), "\\s+")).as("toks"))
    val plan = formattedPlan(PrefixFilterJoin.selfJoin(docs, 4, 5))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }
}
