package graft

import org.apache.spark.sql.functions._

import graft.alerts.{AlertSchema, Tracklets}

/** Tracklet detection on a planted sky: one exposure with a collinear
  * chain (the tracklet), a tight-but-non-collinear clump, and scattered
  * noise. The chain and only the chain must be labeled.
  */
class TrackletsSpec extends SparkTestBase {

  private def mkScience(rows: Seq[(Long, Double, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("candid", "jd", "ra", "dec")
      .select(col("candid"),
        struct(col("jd"), col("ra"), col("dec")).as("candidate"))
  }

  private val jd0 = 2459370.0 // fixed exposure time

  private lazy val planted = {
    // 8 points marching along a near-great-circle line, 0.3° apart
    val chain = (0 until 8).map { i =>
      (100L + i, jd0, 150.0 + i * 0.3, 20.0 + i * 0.15)
    }
    // tight ball (within link radius but not collinear): 6 points
    val rng = new scala.util.Random(5)
    val ball = (0 until 6).map { i =>
      (200L + i, jd0, 30.0 + rng.nextDouble() * 0.4, -10.0 + rng.nextDouble() * 0.4)
    }
    // isolated noise
    val noise = (0 until 20).map { i =>
      (300L + i, jd0, (i * 37) % 360.0, ((i * 13) % 120) - 60.0)
    }
    chain ++ ball ++ noise
  }

  test("chain is labeled as one tracklet; ball and noise are not") {
    val labels = Tracklets.detect(mkScience(planted)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chainIds = (100L to 107L)
    assert(chainIds.forall(labels.contains), s"chain incomplete: $labels")
    assert(labels.values.toSet.size === 1, s"expected one tracklet: $labels")
    assert(labels.keySet === chainIds.toSet,
      s"non-chain members labeled: ${labels.keySet -- chainIds}")
    // label format TRCK_yyyyMMdd_HHmmss_NN from the exposure jd
    assert(labels.values.head.matches("TRCK_20210604_\\d{6}_00"),
      labels.values.head)
  }

  test("two exposures cluster independently") {
    val two = planted ++ planted.map { case (c, _, ra, dec) =>
      (c + 1000, jd0 + 0.01, ra, dec)
    }
    val labels = Tracklets.detect(mkScience(two)).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(labels.length === 16)
    assert(labels.map(_._2).distinct.length === 2, "one label per exposure")
  }

  test("attach is a broadcast left join defaulting to empty string") {
    val science = mkScience(planted)
    val out = Tracklets.attach(science, Tracklets.detect(science))
    assert(out.count() === planted.size)
    assert(out.filter(col("tracklet") === "").count() === planted.size - 8)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("fixture pipeline end-to-end produces the tracklet column") {
    val alerts = AlertSchema.fixture(spark, 200)
    val out = Tracklets.attach(alerts, Tracklets.detect(alerts))
    assert(out.columns.contains("tracklet"))
    assert(out.count() === 200)
  }
}
