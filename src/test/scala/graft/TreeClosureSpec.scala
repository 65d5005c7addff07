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
