package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: the scan-killer for star joins on
  * partitioned facts — a selective dim filter must prune FACT
  * partitions at runtime, through the join, without any static
  * predicate on the fact side. At 100 TB this is the difference
  * between scanning every date partition and scanning the few the
  * dimension selects; this spec pins that the engine's session
  * defaults leave DPP armed and firing.
  */
class DppSpec extends SparkTestBase {

  test("selective dim filter prunes fact partitions through the join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.core.Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        (col("l_partkey") % 10).as("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    val dim = graft.core.Tables.t(spark, sf, "part")
      .select((col("p_partkey") % 10).as("pk"), col("p_brand"))
      .filter(col("p_brand") === "Brand#13")
      .select("pk").distinct()
    // quantities are integral: sum as long, so the two plans' different
    // partition orders can't produce float-rounding differences
    val joined = fact.join(broadcast(dim), Seq("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")
    // and the pruned plan still computes the right answer
    val want = graft.core.Tables.t(spark, sf, "lineitem")
      .select(col("l_quantity"), (col("l_partkey") % 10).as("pk"))
      .join(dim, Seq("pk"))
      .agg(sum(col("l_quantity").cast("long"))).collect().head.getLong(0)
    assert(joined.collect().head.getLong(0) === want)
  }
}
