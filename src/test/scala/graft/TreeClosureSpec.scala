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
}
