package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Planted-structure semantics for the round-10 analytics operators:
  * the oracle rows prove Spark==DuckDB; these prove both compute the
  * RIGHT thing on inputs with known ground truth.
  */
class GraphCusumSpec extends SparkTestBase {
  import spark.implicits._

  test("CUSUM statistic peaks at a planted level shift") {
    // 200 points at level 100, then 100 points at level 160: the
    // at-most-one-change argmax of |D_k| = |n*S_k - k*S_n| must land
    // exactly on the boundary k = 200
    val cents = (1 to 200).map(_ => 100L) ++ (1 to 100).map(_ => 160L)
    val df = cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("k0", "cents")
    val w = Window.orderBy("k0").partitionBy(lit(1))
    val n = cents.length.toLong
    val sN = cents.sum
    val scored = df
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("s_k",
        sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("d_k", lit(n) * col("s_k") - col("k") * lit(sN))
    val kStar = scored
      .orderBy(abs(col("d_k")).desc, col("k")).limit(1)
      .select("k").head().getLong(0)
    assert(kStar === 200L, s"change point must be the boundary, got $kStar")
  }

  test("CUSUM D_k is offset-free: adding a constant changes nothing") {
    val base = Seq(5L, 9L, 2L, 14L, 3L, 3L, 20L, 1L)
    def dks(vals: Seq[Long]): Seq[Long] = {
      val n = vals.length.toLong
      val sN = vals.sum
      vals.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
        case (sk, i) => n * sk - (i + 1).toLong * sN
      }
    }
    assert(dks(base) === dks(base.map(_ + 1000L)),
      "D_k must be invariant to a level offset")
  }

  test("triangle join counts a planted clique exactly") {
    // K4 on {1,2,3,4} (4 triangles) + a pendant edge + a 3-path:
    // per-node triangle counts are known in closed form
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 9L), // pendant
      (10L, 11L), (11L, 12L) // path, no triangle
    ).toDF("u", "v")
    val tri = edges.as("e1")
      .join(edges.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .join(edges.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
    // using-join reorders columns (join keys first) — read by name
    val rows = tri.collect().map(r => (r.getAs[Long]("a"),
      r.getAs[Long]("b"), r.getAs[Long]("c")))
    assert(rows.length === 4, s"K4 has exactly 4 triangles: ${rows.toSeq}")
    assert(rows.toSet === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)), "each triangle enumerated exactly once, ordered a<b<c")
    val perNode = rows.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(perNode === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3),
      "every K4 node sits in 3 triangles")
  }

  test("transition counts: lag pairs per user in time order") {
    val ev = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "a"),
      (2L, 100L, "b"), (2L, 150L, "b")
    ).toDF("user_id", "ts_us", "event_type")
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    val trans = ev
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(trans === Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("b", "b") -> 1L))
  }
}
