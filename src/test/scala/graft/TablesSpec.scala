package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Tables.t

/** Determinism of the oracle-parity numeric helpers: decimal sums must
  * be bit-identical regardless of partitioning/evaluation order —
  * that's the whole reason they exist (double sums are not).
  */
class TablesSpec extends SparkTestBase {

  test("sumDec is invariant under repartitioning") {
    val li = t(spark, sf, "lineitem")
    val results = Seq(1, 3, 16).map { n =>
      li.repartition(n)
        .agg(Tables.sumDec(col("l_extendedprice")).as("s"))
        .collect()(0).getDouble(0)
    }
    assert(results.distinct.size === 1, results)
  }

  test("mulDec product sum is invariant under repartitioning") {
    val li = t(spark, sf, "lineitem")
    val results = Seq(2, 7).map { n =>
      li.repartition(n)
        .agg(sum(Tables.mulDec(col("l_extendedprice"), lit(1) - col("l_discount")))
          .cast("double").as("s"))
        .collect()(0).getDouble(0)
    }
    assert(results.distinct.size === 1, results)
  }

  test("avgDec equals decimal sum / count") {
    val li = t(spark, sf, "lineitem")
    val row = li.agg(
      Tables.avgDec(col("l_quantity")).as("a"),
      Tables.sumDec(col("l_quantity")).as("s"),
      count(col("l_quantity")).as("n")).collect()(0)
    assert(row.getDouble(0) === row.getDouble(1) / row.getLong(2))
  }
}
