package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** MERGE-INTO semantics of the keyed upsert: replace on matched key,
  * insert on new key, pass through the rest — and the plan must anti-
  * join the base against broadcast update KEYS (one base scan, no base
  * shuffle for a small delta).
  */
class UpsertSpec extends SparkTestBase {

  test("upsert replaces matched keys, inserts new, passes the rest") {
    import spark.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "n")
    val updates = Seq((2L, "B!", 99), (9L, "new", 1)).toDF("k", "v", "n")
    val out = Upsert.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out === Set(
      (1L, "a", 10), // untouched
      (2L, "B!", 99), // replaced
      (3L, "c", 30), // untouched
      (9L, "new", 1))) // inserted
  }

  test("a small delta broadcasts: the base is never shuffled") {
    import spark.implicits._
    val base = spark.range(0, 100000)
      .select($"id".as("k"), ($"id" * 2).as("v"))
    val updates = Seq((5L, -1L), (100500L, -2L)).toDF("k", "v")
    val merged = Upsert.upsert(base, updates, Seq("k"))
    merged.collect()
    val plan = merged.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString()
      case p: SparkPlan => p.toString()
    }
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti join should broadcast the delta keys:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"base got shuffled for a 2-row delta:\n$plan")
  }

  test("multi-column keys match on the full tuple") {
    import spark.implicits._
    val base = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val updates = Seq((1L, "y", 9.9)).toDF("k1", "k2", "v")
    val out = Upsert.upsert(base, updates, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set((1L, "x", 1.0), (1L, "y", 9.9)))
  }
}
