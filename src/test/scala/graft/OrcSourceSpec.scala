package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables

/** ORC file format — the other columnar format Spark ships natively
  * (the Hadoop-ecosystem interchange format parquet replaced but every
  * migration still reads): write/read parity against the parquet
  * truth, predicate pushdown into the ORC scan, and Hive-style
  * partition pruning.
  */
class OrcSourceSpec extends SparkTestBase {

  test("write/read parity with parquet on lineitem") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    val dir = Files.createTempDirectory("graft_orc_").toString + "/li"
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === li.count())
    val a = li.agg(sum("l_quantity")).head.getDouble(0)
    val b = back.agg(sum("l_quantity")).head.getDouble(0)
    assert(a === b)
    assert(back.schema.map(_.name) === li.schema.map(_.name))
  }

  test("predicate pushdown reaches the ORC scan") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val dir = Files.createTempDirectory("graft_orc_pd_").toString + "/li"
    li.write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("l_returnflag") === "R")
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"),
      s"filter did not push into the ORC scan:\n$p")
    assert(q.count() ===
      li.filter(col("l_returnflag") === "R").count())
  }

  test("partition pruning on a Hive-partitioned ORC table") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val dir = Files.createTempDirectory("graft_orc_pp_").toString + "/li"
    li.write.mode("overwrite").partitionBy("l_returnflag").orc(dir)
    val q = spark.read.orc(dir).filter(col("l_returnflag") === "A")
    assert(q.count() === li.filter(col("l_returnflag") === "A").count())
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters") && p.contains("l_returnflag"),
      s"no partition filter in the ORC scan:\n$p")
  }
}
