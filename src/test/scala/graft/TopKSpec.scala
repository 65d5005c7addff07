package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** TopK mergeable Aggregator: parity with the rank window it replaces
  * (including adversarial ties), merge correctness across many
  * partitions, and the plan shape it exists for — a partial/final
  * ObjectHashAggregate with no Window and no per-group full sort.
  */
class TopKSpec extends SparkTestBase {

  private def topkRows(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(TopK.topkLong(col("v"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col._1").as("v"), col("col._2").as("id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1) + 0L, r.getLong(2), r.getLong(3)))
      .toSet

  private def windowRows(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("g", "rank", "v", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("equals the rank window on seeded random data with heavy ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // values drawn from a tiny domain so ties dominate — the id
    // tiebreak is what makes the result deterministic
    val df = (1L to 5000L).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(9).toLong, i)
    }.toDF("g", "v", "id").repartition(11)
    for (k <- Seq(1, 3, 8))
      assert(topkRows(df, k) === windowRows(df, k), s"k=$k")
  }

  test("groups smaller than k return all rows in order") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L))
      .toDF("g", "v", "id")
    assert(topkRows(df, 5) === Set(
      (1L, 1L, 20L, 2L), (1L, 2L, 10L, 1L), (2L, 1L, 5L, 3L)))
  }

  test("merge across many partitions preserves exact order") {
    import spark.implicits._
    // one group, values 1..1000 scattered over 32 partitions: top-4
    // must be exactly 1000..997 whatever merge order Spark picks
    val df = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle((1L to 1000L).toList)
      .map(v => (0L, v, v)).toDF("g", "v", "id").repartition(32)
    assert(topkRows(df, 4) === Set(
      (0L, 1L, 1000L, 1000L), (0L, 2L, 999L, 999L),
      (0L, 3L, 998L, 998L), (0L, 4L, 997L, 997L)))
  }

  test("plans a partial/final ObjectHashAggregate, no Window") {
    val ev = graft.core.Tables.t(spark, sf, "events")
      .select(col("user_id").as("g"), col("ts").as("v"),
        col("event_id").as("id"))
    val plan = formattedPlan(
      ev.groupBy("g").agg(TopK.topkLong(col("v"), col("id"), 5).as("tk")))
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
  }

  test("registered SQL surface graft_topk8") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 2L), (5L, 1L), (3L, 3L)).toDF("v", "id")
      .createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT graft_topk8(v, id) AS tk FROM topk_in")
      .selectExpr("transform(tk, x -> x._1) AS vs")
      .collect().head.getSeq[Long](0)
    assert(got === Seq(5L, 3L, 1L))
  }
}
