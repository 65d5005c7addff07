package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Pure-SQL end-to-end surface: a user who only speaks SQL registers
  * the tables as temp views and the graft expressions via
  * GraftExtensions, then runs joins, windows, and the custom kernels
  * entirely through `spark.sql` — asserted against the DataFrame
  * forms. This is the "switch from the reference" usability contract:
  * no Scala required at query time.
  */
class SqlSurfaceSpec extends SparkTestBase {

  private def register(): Unit = {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    Seq("lineitem", "orders", "customer", "documents").foreach { t =>
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    }
  }

  test("SQL join + window + aggregate matches the DataFrame form") {
    register()
    val viaSql = spark.sql("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          AS BIGINT) AS rev_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus""").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaDf = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("rev_cents"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaSql === viaDf)
  }

  test("graft kernels are callable from SQL: hilbert, simhash, ang2pix") {
    register()
    val rows = spark.sql("""
      SELECT doc_id,
        graft_hilbert(doc_id % 32, doc_id % 17, 5) AS h,
        graft_simhash(split(lower(text), ' ')) AS sh,
        graft_ang2pix(CAST(doc_id % 360 AS DOUBLE),
          CAST(doc_id % 89 AS DOUBLE), 16) AS pix
      FROM documents LIMIT 50""").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) ===
        graft.functions.HilbertCurve.xy2d(5, id % 32, id % 17))
      assert(r.getLong(3) >= 0 && r.getLong(3) < 12L * 16 * 16)
    }
    assert(rows.map(_.getLong(2)).distinct.length > 1,
      "simhash must vary across documents")
  }

  test("parameterized SQL: named parameters bind literals safely") {
    register()
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = :st",
      Map("st" -> "F")).head.getLong(0)
    val expected = Tables.t(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(n === expected)
    // positional form
    val n2 = spark.sql(
      "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = ?",
      Array("F")).head.getLong(0)
    assert(n2 === expected)
  }

  test("SQL UDAF sketches: graft_kmv64 distinct estimate in plain SQL") {
    register()
    val mins = spark.sql(
      "SELECT graft_kmv64(md5(CAST(c_custkey AS STRING))) AS sk FROM customer")
      .head.getSeq[String](0)
    val exact = Tables.t(spark, sf, "customer")
      .select(countDistinct(col("c_custkey"))).head.getLong(0)
    // Decode the Bar-Yossef (k-1)/u_k estimate the q136 way: u_k =
    // first 13 hex nibbles of the kth minimum over 2^52 (both exact
    // in a double). Under k distinct keys the sketch IS the key set.
    val est =
      if (mins.size < 64) mins.size.toDouble
      else {
        val uk = java.lang.Long.parseLong(mins.last.take(13), 16)
          .toDouble / 4503599627370496.0
        63.0 / uk
      }
    // 30% is the SketchSpec-certified envelope for k=64
    assert(math.abs(est - exact) <= 0.30 * exact,
      s"KMV estimate $est vs exact $exact outside 30% envelope")
  }
}
