package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.core.Tables.t

/** Physical-plan assertions — the 100 TB scale contract:
  * filters and column pruning reach the parquet scan, deliberate
  * broadcasts happen, and no bucketed operator degenerates into a
  * cartesian product.
  */
class PlanSpec extends SparkTestBase {

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString()
  }

  /** Executed plan string AFTER running the query, so AQE has replaced
    * its placeholders with final sub-plans.
    */
  private def finalPlanString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    // collect() (not a .write, which builds a SEPARATE QueryExecution)
    // so THIS df's adaptive plan is the one that executed
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString()
      case p: SparkPlan => p.toString()
    }
  }

  test("q02 pushes its filters into the parquet scan") {
    val p = planString("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    // projection pruning: the scan must not read all 16 lineitem cols
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_comment"), s"scan reads unneeded columns:\n$p")
  }

  test("q01 scan reads only the aggregated columns") {
    val p = planString("q01_pricing_summary")
    assert(!p.contains("l_partkey"), s"scan reads unneeded columns:\n$p")
  }

  test("q04 broadcast hint produces a broadcast join") {
    val p = planString("q04_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("LSH dedup and ANN plans contain no cartesian product") {
    for (q <- Seq("q21_minhash_lsh", "q25_ann_lsh", "q26_embedding_neardup")) {
      val p = finalPlanString(q)
      assert(!p.contains("CartesianProduct"), s"$q degenerated:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q degenerated:\n$p")
    }
  }

  test("q24 brute-force kNN is probe-broadcast, not a shuffle product") {
    // The deliberate exact baseline: small probe set broadcast against a
    // single corpus scan (BroadcastNestedLoopJoin on a non-equi condition).
    val p = finalPlanString("q24_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("whole-stage codegen covers the relational hot path") {
    // inspect the final AQE plan — pre-execution the adaptive wrapper
    // hides the codegen stage annotations. In toString form a
    // WholeStageCodegen stage renders as a "*(n) " operator prefix.
    val p = finalPlanString("q01_pricing_summary")
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p)
  }
}
