package graft

import org.apache.spark.sql.functions._

import graft.alerts.Crossmatch

/** Crossmatch correctness: the healpix-bucketed join must reproduce the
  * brute-force cone search exactly (100% recall/precision) on random
  * sky, including pixel-boundary and pole cases.
  */
class CrossmatchSpec extends SparkTestBase {

  private val radiusDeg = 1.5 / 3600.0 * 100 // ~0.042° — generous test cone

  private lazy val (alertsDf, catalogDf) = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val cat = (0 until 60).map { i =>
      (s"CAT$i", rng.nextDouble() * 360.0, rng.nextDouble() * 180.0 - 90.0)
    }
    // half the alerts are planted within the radius of some catalog row
    val alerts = (0 until 400).map { i =>
      if (i % 2 == 0) {
        val (_, cra, cdec) = cat(i % cat.size)
        val dr = (rng.nextDouble() - 0.5) * radiusDeg
        val dd = (rng.nextDouble() - 0.5) * radiusDeg
        (i.toLong, cra + dr / math.max(0.05, math.cos(math.toRadians(cdec))), cdec + dd)
      } else (i.toLong, rng.nextDouble() * 360.0, rng.nextDouble() * 180.0 - 90.0)
    }
    (alerts.toDF("id", "ra", "dec"),
      cat.toDF("cat_name", "cat_ra", "cat_dec"))
  }

  private def bruteForce(): Set[(Long, String)] =
    alertsDf.crossJoin(catalogDf)
      .withColumn("sep", Crossmatch.angularSepDeg(
        col("ra"), col("dec"), col("cat_ra"), col("cat_dec")))
      .filter(col("sep") <= radiusDeg)
      .select("id", "cat_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("bucketed crossmatch equals brute force exactly") {
    val got = Crossmatch
      .crossmatch(alertsDf, col("ra"), col("dec"), catalogDf, radiusDeg)
      .select("id", "cat_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = bruteForce()
    assert(want.nonEmpty, "fixture must contain true matches")
    assert((want -- got).isEmpty, s"missed matches: ${(want -- got).take(5)}")
    assert((got -- want).isEmpty, s"false matches: ${(got -- want).take(5)}")
  }

  test("nearestLabel keeps every alert and defaults to Unknown") {
    val labeled = Crossmatch.nearestLabel(
      alertsDf, col("ra"), col("dec"), col("id"), catalogDf, radiusDeg)
    assert(labeled.count() === 400)
    val matchedIds = bruteForce().map(_._1)
    val unknowns = labeled.filter(col("cdsxmatch") === "Unknown")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(unknowns === (0L until 400L).toSet -- matchedIds)
  }

  test("RA wrap-around and polar matches are found") {
    import spark.implicits._
    val r = radiusDeg
    val cat = Seq(
      ("WRAP", 359.9999, 0.0),
      ("NPOLE", 10.0, 89.995),
      ("SPOLE", 200.0, -89.995)).toDF("cat_name", "cat_ra", "cat_dec")
    val alerts = Seq(
      (1L, 0.0001, 0.0), // across the RA seam from WRAP
      (2L, 190.0, 89.997), // near north pole, very different RA
      (3L, 20.0, -89.996), // near south pole
      (4L, 180.0, 0.0) // far from everything
    ).toDF("id", "ra", "dec")
    val got = Crossmatch
      .crossmatch(alerts, col("ra"), col("dec"), cat, r)
      .select("id", "cat_name").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    val want = alerts.crossJoin(cat)
      .withColumn("sep", Crossmatch.angularSepDeg(
        col("ra"), col("dec"), col("cat_ra"), col("cat_dec")))
      .filter(col("sep") <= r)
      .select("id", "cat_name").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(want.contains((1L, "WRAP")), "fixture: seam pair must be a true match")
    assert(got === want, s"got $got want $want")
    assert(!got.exists(_._1 == 4L))
  }

  test("nside auto-selection keeps pixels comfortably larger than the cone") {
    val nside = Crossmatch.nsideFor(radiusDeg)
    assert(Crossmatch.pixelSizeDeg(nside) >= 4 * radiusDeg)
    assert(Crossmatch.pixelSizeDeg(nside * 2) < 4 * radiusDeg)
  }

  test("alert side is never exploded and the join is broadcast") {
    val plan = Crossmatch
      .crossmatch(alertsDf, col("ra"), col("dec"), catalogDf, radiusDeg)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the generate (explode) must sit on the catalog side only: the plan
    // has exactly one Generate and no cartesian product
    assert(plan.split("Generate").length == 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
