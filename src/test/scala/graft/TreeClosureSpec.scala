package graft

import graft.operators.TreeClosure

/** Pointer-doubling ancestor closure: must equal the transitive
  * closure on deep chains (the shape that punishes one-hop loops),
  * branching trees, and forests.
  */
class TreeClosureSpec extends SparkTestBase {
  import spark.implicits._

  test("deep chain closes completely (64 levels)") {
    // chain 1 <- 2 <- 3 ... <- 64: node k has k-1 ancestors
    val edges = (2L to 64L).map(k => (k, k - 1)).toDF("child", "parent")
    val anc = TreeClosure.ancestors(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      k <- 2L to 64L
      a <- 1L until k
    } yield (k, a)).toSet
    assert(anc.toSet === expect, "every proper ancestor, nothing else")
    assert(anc.length === expect.size, "no duplicate closure rows")
  }

  test("diamond DAG: multi-path ancestors still deduplicate") {
    // 4 has TWO parents (2, 3) that share parent 1 — ancestor 1 is
    // reachable from 4 along two paths. The quadrupled round composes
    // an un-deduped union with itself, so this shape is the one that
    // would surface duplicate pairs if the in-plan distincts slipped.
    val edges = Seq((4L, 2L), (4L, 3L), (2L, 1L), (3L, 1L))
      .toDF("child", "parent")
    val anc = TreeClosure.ancestors(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(anc.toSet === Set((4L, 2L), (4L, 3L), (4L, 1L),
      (2L, 1L), (3L, 1L)))
    assert(anc.length === 5, "exactly one row per (node, anc) pair")
  }

  test("forest with branching: ancestors never cross trees") {
    // tree A: 1 <- {2, 3}, 2 <- 4 ; tree B: 10 <- 11
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (11L, 10L))
      .toDF("child", "parent")
    val anc = TreeClosure.ancestors(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(anc === Set((2L, 1L), (3L, 1L), (4L, 2L), (4L, 1L),
      (11L, 10L)))
  }

  test("double-jump round reuses the inner jump's exchanges (no 3x recompute)") {
    // jump(jump(c)) references the inner jump's union+join+distinct
    // subtree THREE times (the outer union leg + both outer join
    // legs); the per-round cost model assumes ReuseExchange collapses
    // those duplicated shuffle subtrees so the inner jump computes
    // ONCE. Pin that shape (measured r14, AQE off so the static
    // ReuseExchange rule is visible in the plan: 4 real exchanges,
    // 2 reuses): a Spark upgrade that broke the reuse would silently
    // triple per-round work. AQE's runtime stage reuse dedupes the
    // same way; this non-adaptive view is the assertable one.
    val edges = (2L to 100L).map(i => (i, i / 2))
      .toDF("node", "anc").localCheckpoint()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = TreeClosure.jump(TreeClosure.jump(edges))
        .queryExecution.executedPlan.toString()
      val real = p.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Reused"))
      val reused = p.linesIterator.count(_.contains("ReusedExchange"))
      assert(reused >= 2, s"inner-jump subtree no longer reused:\n$p")
      assert(real <= 4, s"double-jump grew extra real exchanges:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
