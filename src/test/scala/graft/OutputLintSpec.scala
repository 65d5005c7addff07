package graft

import org.apache.spark.sql.functions._

import graft.core.OutputLint

/** The q86 failure class, caught in-repo: every oracle-bearing query
  * must emit primitive-only output columns (the driver's pandas
  * row-sort cannot hash array/map/struct cells), and the lint itself
  * must reject a deliberate array output.
  */
class OutputLintSpec extends SparkTestBase {

  test("every oracle query's output schema is driver-comparable") {
    val oracle = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if oracle(name) =>
        name -> OutputLint.nonScalarFields(fn(spark, sf).schema)
    }.filter(_._2.nonEmpty)
    assert(offenders.isEmpty,
      offenders.map { case (n, bad) => s"$n → ${bad.mkString(", ")}" }
        .mkString("non-scalar oracle outputs:\n", "\n", ""))
  }

  test("the lint rejects a deliberate array-valued output") {
    val df = spark.range(3).select(array(col("id")).as("a"), col("id"))
    val e = intercept[IllegalArgumentException] {
      OutputLint.assertDriverComparable("deliberate_array", df.schema)
    }
    assert(e.getMessage.contains("deliberate_array") &&
      e.getMessage.contains("a: array<bigint>"))
  }
}
