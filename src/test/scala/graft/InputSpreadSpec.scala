package graft

import org.apache.spark.sql.functions._

import graft.operators.InputSpread

/** The scale-adaptive input-spread gate (guide §2.5): the keyed
  * repartition must fire ONLY when the plan's native parallelism is
  * below the session default — on a many-file (already parallel)
  * table the corpus is never shuffled just to spread it. r14 gated
  * every formerly unconditional spread site through this operator, so
  * the gate itself needs its own pin.
  */
class InputSpreadSpec extends SparkTestBase {

  test("gate fires on a single-partition input") {
    import spark.implicits._
    val one = (1L to 100L).toDF("id").coalesce(1)
    assume(spark.sparkContext.defaultParallelism > 1)
    val out = InputSpread.byKey(one, col("id"))
    assert(formattedPlan(out).contains("Exchange"),
      "single-partition input must be spread")
  }

  test("gate is a no-op when native parallelism meets the default") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val wide = (1L to 1000L).toDF("id").repartition(par * 2)
    // materialize the repartition into a stable many-partition frame
    val frame = spark.createDataFrame(wide.rdd, wide.schema)
    assert(frame.rdd.getNumPartitions >= par)
    val out = InputSpread.byKey(frame, col("id"))
    assert(out eq frame, "parallel input must pass through untouched")
  }

  test("probe overload gates the TARGET frame by the PROBE's layout") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    assume(par > 1)
    val probeNarrow = (1L to 10L).toDF("id").coalesce(1)
    val wide = (1L to 1000L).toDF("id").repartition(par * 2)
    val probeWide = spark.createDataFrame(wide.rdd, wide.schema)
    val target = (1L to 100L).toDF("id")
    // narrow probe → the target is spread even if it is itself wider
    val spreadOut = InputSpread.byKey(target, col("id"), probeNarrow)
    assert(formattedPlan(spreadOut).contains("Exchange"))
    // wide probe → no-op regardless of the target's own layout
    val passOut = InputSpread.byKey(target, col("id"), probeWide)
    assert(passOut eq target)
  }
}
