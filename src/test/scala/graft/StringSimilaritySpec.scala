package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{StringSimilarity, StringSimilarityInternal}

/** Jaro-Winkler kernel: published golden values (exact doubles as
  * DuckDB computes them — the q298 oracle depends on bit equality),
  * edge conventions, boost-threshold behavior, and the codegen path
  * agreeing with direct eval.
  */
class StringSimilaritySpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    StringSimilarityInternal.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values match DuckDB bit-for-bit") {
    // probed from duckdb jaro_winkler_similarity during development
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    assert(jw("SHACKLEFORD", "SHACKELFORD") === 0.9818181818181818)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("ABAB", "BABA") === 0.8333333333333334)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
    assert(jw("aaaaaaaaaab", "ab") === 0.5303030303030303)
  }

  test("edge conventions: empties 0.0, equal 1.0, prefix cap 4") {
    assert(jw("", "") === 0.0)
    assert(jw("AB", "") === 0.0)
    assert(jw("", "AB") === 0.0)
    assert(jw("A", "A") === 1.0)
    assert(jw("A", "B") === 0.0)
    assert(jw("identical", "identical") === 1.0)
    // cap: 6-char shared prefix still only scores 4 boost steps
    assert(jw("PREFIX", "PREFIXXXXX") === 0.92)
  }

  test("winkler boost applies only above jaro 0.7") {
    // jaro exactly 0.5 with a 2-char common prefix: NO boost
    assert(jw("abcdefgh", "abzzzzzz") === 0.5)
    // jaro 0.7222 (> 0.7) with 1-char prefix: boosted to 0.75
    assert(jw("ABCD", "ACBX") === 0.75)
  }

  test("codegen path equals direct eval and stays in codegen") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("abcd", "abcd"), ("", "x"), ("CRATE", "TRACE"))
    val df = pairs.toDF("a", "b")
      .withColumn("jw", StringSimilarity.jaroWinkler(col("a"), col("b")))
    val got = df.collect().map(r => r.getDouble(2))
    assert(got === pairs.map { case (a, b) => jw(a, b) })
    // a LocalTableScan constant-folds the projection — assert codegen
    // on a parquet-backed plan, where the kernel actually runs
    val scan = graft.core.Tables.t(spark, sf, "documents")
      .withColumn("jw",
        StringSimilarity.jaroWinkler(col("lang"), col("source")))
    // executedPlan.toString marks WholeStageCodegen stages with `*(n)`
    assert(formattedPlan(scan).contains("*(1) Project"))
    assert(scan.select(sum(when(col("jw") >= 0.0 && col("jw") <= 1.0, 0L)
      .otherwise(1L))).collect().head.getLong(0) === 0L)
  }

  test("null-safe and SQL-registered as graft_jaro_winkler") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Some("MARTHA"), Some("MARHTA")), (None, Some("x")),
      (Some("x"), None))
      .toDF("a", "b").createOrReplaceTempView("jw_in")
    val got = spark.sql(
      "SELECT graft_jaro_winkler(a, b) AS jw FROM jw_in")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got === Array(Some(0.9611111111111111), None, None))
  }
}
