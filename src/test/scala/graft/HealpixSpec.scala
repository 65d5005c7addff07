package graft

import org.apache.spark.sql.functions._

import graft.alerts.Healpix
import graft.functions.SpatialFunctions

/** HEALPix correctness by structural property — no healpy goldens are
  * available offline, so correctness rests on the scheme's defining
  * invariants, which a wrong implementation cannot satisfy:
  *  - indices in range, all 12 faces reachable;
  *  - the NESTED hierarchy: pix(2·nside) >> 2 == pix(nside) for every
  *    point (bit-interleaving property);
  *  - pix2ang ∘ ang2pix lands in the same pixel (round trip);
  *  - pixel centers of all pixels map back to themselves (bijection).
  */
class HealpixSpec extends SparkTestBase {

  private val samples: Seq[(Double, Double)] = {
    val rng = new scala.util.Random(3)
    Seq.fill(2000)((rng.nextDouble() * 360.0, rng.nextDouble() * 180.0 - 90.0)) ++
      Seq((0.0, 90.0), (0.0, -90.0), (0.0, 0.0), (180.0, 0.0), (359.99, 41.9),
        (90.0, 66.6), (45.0, -41.8), (0.0, 66.56), (315.0, -66.56))
  }

  test("indices in range and all faces reachable at nside=1") {
    val pix1 = samples.map { case (ra, dec) => Healpix.ang2pixNest(1, ra, dec) }
    assert(pix1.forall(p => p >= 0 && p < 12))
    assert(pix1.toSet.size === 12, "random sky must hit all 12 base faces")
    for (nside <- Seq(2, 64, 1024)) {
      val npix = 12L * nside * nside
      assert(samples.forall { case (ra, dec) =>
        val p = Healpix.ang2pixNest(nside, ra, dec); p >= 0 && p < npix
      })
    }
  }

  test("nested hierarchy: doubling nside appends two bits") {
    for ((ra, dec) <- samples; nside <- Seq(1, 2, 16, 256)) {
      val coarse = Healpix.ang2pixNest(nside, ra, dec)
      val fine = Healpix.ang2pixNest(nside * 2, ra, dec)
      assert(fine >> 2 === coarse,
        s"hierarchy broken at nside=$nside ra=$ra dec=$dec: $fine >> 2 != $coarse")
    }
  }

  test("round trip: pixel center maps back to the same pixel") {
    for (nside <- Seq(1, 8, 256); (ra, dec) <- samples.take(500)) {
      val p = Healpix.ang2pixNest(nside, ra, dec)
      val (cra, cdec) = Healpix.pix2angNest(nside, p)
      assert(Healpix.ang2pixNest(nside, cra, cdec) === p,
        s"round trip broke: nside=$nside pix=$p center=($cra,$cdec)")
    }
  }

  test("pix2ang is a left inverse over every pixel at nside=8") {
    val nside = 8
    for (p <- 0L until 12L * nside * nside) {
      val (ra, dec) = Healpix.pix2angNest(nside, p)
      assert(Healpix.ang2pixNest(nside, ra, dec) === p, s"pixel $p")
    }
  }

  test("the Catalyst expression matches the Scala function and codegens") {
    import spark.implicits._
    val df = samples.take(200).toDF("ra", "dec")
    val got = df
      .select(col("ra"), col("dec"),
        SpatialFunctions.ang2pix(col("ra"), col("dec"), 256).as("pix"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === Healpix.ang2pixNest(256, r.getDouble(0), r.getDouble(1)))
    }
    // stays inside a codegen stage (no UDF/BatchEvalPython-style break)
    val plan = df
      .select(SpatialFunctions.ang2pix(col("ra"), col("dec"), 256))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BatchEval"), plan)
  }

  test("multi-resolution pixel array") {
    import spark.implicits._
    val row = Seq((10.0, 20.0)).toDF("ra", "dec")
      .select(SpatialFunctions.ang2pixMulti(col("ra"), col("dec"), Seq(64, 128, 256)))
      .collect()(0).getSeq[Long](0)
    assert(row === Seq(64, 128, 256).map(n => Healpix.ang2pixNest(n, 10.0, 20.0)))
  }
}
