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

  test("q22 pair join ships ids only: no token arrays below the join") {
    val p = finalPlanString("q22_jaccard_blocked")
    // the candidate join must exist and the exploded/salted sides must
    // not carry the hashed-token arrays (they re-attach by id above)
    assert(!p.contains("CartesianProduct"), p)
    val joins = p.linesIterator.filter(_.contains("Join")).toList
    assert(joins.nonEmpty, p)
    // the salt-replicating Generate (explode of the salt sequence) must
    // project only scalar columns, never `toks`
    val generates = p.linesIterator
      .filter(l => l.contains("Generate explode"))
      .filter(l => l.contains("salt") || l.contains("sequence"))
      .toList
    assert(generates.nonEmpty, s"salt explode missing:\n$p")
    generates.foreach(g =>
      assert(!g.contains("toks"), s"token payload rides the salt explode:\n$g"))
  }

  test("q52 bm25 plans no keyed exchange: stats reduce to one broadcast row") {
    val p = finalPlanString("q52_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"stats row is not broadcast:\n$p")
    // the only aggregation is the global (keyless) stats reduce; a
    // HashAggregate keyed on doc columns would mean a corpus shuffle
    assert(!p.contains("Exchange hashpartitioning"), s"corpus got shuffled:\n$p")
  }

  test("q54 contamination broadcasts the benchmark set, never the corpus") {
    val p = finalPlanString("q54_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
  }

  test("q53/q55 are single-pass: no join anywhere in the plan") {
    for (q <- Seq("q53_hash_split", "q55_chunking")) {
      val p = finalPlanString(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
    }
  }

  test("q45 as-of join plans a window over ONE sort, no join operator") {
    val p = finalPlanString("q45_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"as-of should be join-free:\n$p")
  }

  test("AQE splits a skewed join partition at runtime (Y6 scale contract)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // shrink the skew thresholds so a test-sized hot key triggers the
      // same OptimizeSkewedJoin path a 100 TB hot key would
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 150k rows on ONE key vs a uniform right side — a classic
      // hot-key fact-fact join. The payload is a per-row md5 so the
      // hot shuffle partition cannot compress away below the skew
      // threshold (identical keys alone deflate to nothing).
      val left = spark.range(0, 160000)
        .select(
          when($"id" < 150000, 7L).otherwise($"id").as("k"),
          md5(concat(lit("row"), $"id".cast("string"))).as("pad"))
      val right = spark.range(0, 1000).select($"id".as("k"), lit(1).as("rv"))
      val j = left.join(right, "k")
      j.collect()
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString()
        case p: SparkPlan => p.toString()
      }
      assert(plan.contains("skew=true"),
        s"hot key was not split by AQE:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // Spark's runtime row-level filtering: a selective filter on the
    // dim side materializes a bloom filter that is pushed into the
    // fact scan — at 100 TB this is what keeps a fact-dim join from
    // reading fact rows the dim filter already excluded. On by default
    // at cluster scale (10 GB application-side threshold); the test
    // lowers the threshold so an sf-test-sized join exercises the path.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderstatus") === "F")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)))
      val p = j.queryExecution.optimizedPlan.toString()
      assert(p.contains("bloom_filter_agg") || p.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("whole-stage codegen covers the relational hot path") {
    // inspect the final AQE plan — pre-execution the adaptive wrapper
    // hides the codegen stage annotations. In toString form a
    // WholeStageCodegen stage renders as a "*(n) " operator prefix.
    val p = finalPlanString("q01_pricing_summary")
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p)
  }
}
