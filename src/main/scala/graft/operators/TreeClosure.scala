package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ancestor-closure over an arbitrary (child, parent) edge list by
  * POINTER DOUBLING: each round joins the current closure with itself,
  * so reachable distance doubles per round and a depth-D hierarchy
  * closes in ceil(log2 D) joins — the scale-safe replacement for
  * driver-side recursion or one-hop-per-round loops (a 1M-deep chain
  * would need 20 rounds, not 1M).
  *
  * Every round localCheckpoints (the [[graft.queries.Dedup]]
  * fixpoint discipline): without lineage truncation the logical plan
  * doubles per iteration and the driver dies on plan strings long
  * before data pressure.
  *
  * Output: (node, anc) — one row per proper ancestor of each node.
  * Cycles would never terminate; callers own acyclicity (a DAG/tree
  * contract, the same one SQL's WITH RECURSIVE has).
  */
object TreeClosure {

  def ancestors(edges: DataFrame): DataFrame = {
    val base = edges.toDF("node", "anc").localCheckpoint()
    var closure = base
    var grew = true
    while (grew) {
      // double: any ancestor-of-an-ancestor at current max distance
      val jumped = closure
        .join(closure.select(col("node").as("anc"), col("anc").as("anc2")),
          Seq("anc"))
        .select(col("node"), col("anc2").as("anc"))
      val next = closure.union(jumped).distinct().localCheckpoint()
      // closure is monotone — growth check by count, not except()
      grew = next.count() > closure.count()
      closure.unpersist()
      closure = next
    }
    closure
  }
}
