package graft

import org.apache.spark.sql.functions._

import graft.queries.Validation.{OlsB0n, OlsB1n, OlsB2n, OlsDet}

/** q309's Cramer-rule OLS algebra, pinned independently of the oracle
  * (both engines share the formula text, so hash equality alone can't
  * catch a wrong-but-symmetric derivation): on planted exact data
  * y = 3 + 2·x1 − x2 the normal equations have an integer solution
  * and every Cramer product stays below 2^53, so the recovered
  * coefficients must be EXACTLY (3, 2, −1).
  */
class OlsSpec extends SparkTestBase {

  test("planted y = 3 + 2*x1 - x2 recovers (3, 2, -1) exactly") {
    import spark.implicits._
    // x-grid chosen non-degenerate (det != 0): all 35 combinations
    val rows = for (x1 <- -3 to 3; x2 <- -2 to 2)
      yield (x1.toLong, x2.toLong, 3L + 2L * x1 - x2)
    val g = rows.toDF("x1", "x2", "y")
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(expr("x1 * x1")).as("s11"), sum(expr("x2 * x2")).as("s22"),
        sum(expr("x1 * x2")).as("s12"), sum(col("y")).as("sy"),
        sum(expr("x1 * y")).as("s1y"), sum(expr("x2 * y")).as("s2y"))
      .withColumn("nd", expr("CAST(n AS DOUBLE)"))
      .withColumn("sx1d", expr("CAST(sx1 AS DOUBLE)"))
      .withColumn("sx2d", expr("CAST(sx2 AS DOUBLE)"))
      .withColumn("syd", expr("CAST(sy AS DOUBLE)"))
      .withColumn("det", expr(OlsDet))
      .withColumn("b0", expr(s"$OlsB0n / $OlsDet"))
      .withColumn("b1", expr(s"$OlsB1n / $OlsDet"))
      .withColumn("b2", expr(s"$OlsB2n / $OlsDet"))
      .select("det", "b0", "b1", "b2")
      .collect().head
    assert(g.getDouble(0) !== 0.0)
    assert(g.getDouble(1) === 3.0)
    assert(g.getDouble(2) === 2.0)
    assert(g.getDouble(3) === -1.0)
  }

  test("noise on one cell moves only what it should (sanity, not exact)") {
    import spark.implicits._
    val rows = (for (x1 <- -3 to 3; x2 <- -2 to 2)
      yield (x1.toLong, x2.toLong, 3L + 2L * x1 - x2)) :+ (0L, 0L, 103L)
    val g = rows.toDF("x1", "x2", "y")
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(expr("x1 * x1")).as("s11"), sum(expr("x2 * x2")).as("s22"),
        sum(expr("x1 * x2")).as("s12"), sum(col("y")).as("sy"),
        sum(expr("x1 * y")).as("s1y"), sum(expr("x2 * y")).as("s2y"))
      .withColumn("nd", expr("CAST(n AS DOUBLE)"))
      .withColumn("sx1d", expr("CAST(sx1 AS DOUBLE)"))
      .withColumn("sx2d", expr("CAST(sx2 AS DOUBLE)"))
      .withColumn("syd", expr("CAST(sy AS DOUBLE)"))
      .withColumn("b0", expr(s"$OlsB0n / $OlsDet"))
      .withColumn("b1", expr(s"$OlsB1n / $OlsDet"))
      .withColumn("b2", expr(s"$OlsB2n / $OlsDet"))
      .select("b0", "b1", "b2").collect().head
    // an outlier at the origin shifts the intercept up, slopes stay
    // (origin is the grid centroid, so the x-columns are orthogonal
    // to the perturbation)
    assert(g.getDouble(0) > 3.0)
    assert(math.abs(g.getDouble(1) - 2.0) < 1e-9)
    assert(math.abs(g.getDouble(2) + 1.0) < 1e-9)
  }
}
