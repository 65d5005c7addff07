package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{AsOfJoin, DerivedTable, RangeLayout}
import graft.queries.SimGraph

/** Round-11 consolidation items: the shared SimGraph materialization
  * amortizes the gram pass across the graph pack (build exactly once),
  * and the new precondition guards actually fire.
  */
class Round11Spec extends SparkTestBase {

  test("SimGraph pairs build exactly once per dataset; consumers scan it") {
    val before = DerivedTable.builds.get()
    val p1 = SimGraph.pairs(spark, sf).count()
    val afterFirst = DerivedTable.builds.get()
    // second consumer — and the derived views — must NOT rebuild
    val p2 = SimGraph.pairs(spark, sf).count()
    val e = SimGraph.edges(spark, sf).count()
    val dp = SimGraph.directedPairs(spark, sf).count()
    assert(afterFirst - before <= 1, "first call builds at most once")
    assert(DerivedTable.builds.get() === afterFirst,
      "subsequent consumers must reuse the materialized table")
    assert(p1 === p2)
    assert(dp === 2 * p1, "directed view is both orientations")
    assert(e <= p1 && e > 0, "thresholded edges are a non-empty subset")

    // consumers' plans read the managed table — the corpus gram pass
    // (explode over documents text) must not appear
    val plan = formattedPlan(SimGraph.edges(spark, sf))
    assert(plan.contains("g_derived_sim_pairs"),
      s"edge scan should hit the derived table, got:\n$plan")
    assert(!plan.toLowerCase.contains("explode"),
      "no gram explode in an amortized consumer plan")
  }

  test("graph-pack queries share one gram pass per dataset") {
    // force the artifact for sf once, then run two full graph queries;
    // the build counter must not move
    SimGraph.pairs(spark, sf).count()
    val builds = DerivedTable.builds.get()
    val tri = graft.queries.Graph.defs
      .find(_.name == "q162_doc_triangles").get.fn(spark, sf).count()
    val nn = graft.queries.Graph.defs
      .find(_.name == "q187_mutual_nn").get.fn(spark, sf).count()
    assert(tri >= 0 && nn >= 0)
    assert(DerivedTable.builds.get() === builds,
      "graph queries must consume the shared artifact, not rebuild it")
  }

  test("nearestJoin rejects payload/left column collisions up front") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "val")
    val right = Seq((1L, 9L, "y")).toDF("k", "t", "val")
    // payload name collides with a left column
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.nearestJoin(left, right, "k", "t", Seq("val"), 100L)
    }
    assert(e1.getMessage.contains("collision"))
    // left frame already carries a reserved output name
    val left2 = left.withColumn("asof_dir", lit("stale"))
    val right2 = Seq((1L, 9L, "y")).toDF("k", "t", "p")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.nearestJoin(left2, right2, "k", "t", Seq("p"), 100L)
    }
    assert(e2.getMessage.contains("asof"))
  }

  test("curve layouts validate the key domain before normalizing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_curve_guard_").toString
    // negative keys: the grid scale would go negative — rejected
    val neg = Seq((-1L, 5L), (3L, 2L)).toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      RangeLayout.writeZOrdered(neg, "a", "b", 4, 2, s"$dir/neg")
    }
    assert(e1.getMessage.contains("non-negative"))
    // max * grid overflows Long — rejected, not silently scattered
    val huge = Seq((Long.MaxValue / 2, 1L), (7L, 2L)).toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      RangeLayout.writeHilbertOrdered(huge, "a", "b", 10, 2, s"$dir/huge")
    }
    assert(e2.getMessage.contains("overflow"))
    // the valid domain still writes (guard is not over-eager)
    val ok = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("a"), col("o_custkey").as("b"))
    RangeLayout.writeZOrdered(ok, "a", "b", 4, 2, s"$dir/ok")
    assert(spark.read.parquet(s"$dir/ok").count() === ok.count())
  }
}
