package graft.alerts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A6 tracklet detection: per-exposure grouped-map clustering of
  * detections that lie along a great circle (satellite glints / fast
  * movers leave collinear chains within one exposure), then J1 broadcast
  * outer join of the labels back onto the science table.
  *
  * The reference does this in applyInPandas with numpy einsum/polyfit
  * (ref: ztf/tracklet_identification.py:123-334). Re-expressed as
  * `Dataset.groupByKey(jd).flatMapGroups` over plain Scala math:
  *
  *  1. detections of one exposure → unit vectors on the sphere;
  *  2. single-linkage clustering with an angular-distance threshold
  *     (union-find — exposures hold at most a few thousand detections,
  *     so the per-group O(n²) pair scan is bounded and local);
  *  3. keep clusters with ≥ minPoints members whose best-fit plane
  *     through the origin (smallest-eigenvector of the 3×3 scatter
  *     matrix) has RMS residual ≤ maxRmsDeg — i.e. the chain follows a
  *     great circle;
  *  4. label `TRCK_<yyyyMMdd_HHmmss of exposure>_<NN>`.
  *
  * Scale: groups are independent → embarrassingly parallel; the shuffle
  * key (jd) is the exposure timestamp, whose cardinality grows with data
  * so no hot key forms.
  */
object Tracklets {

  case class Detection(candid: Long, jd: Double, ra: Double, dec: Double)

  val DefaultLinkDeg = 0.5
  val DefaultMinPoints = 5
  val DefaultMaxRmsDeg = 0.05

  /** A tracklet is an elongated chain, not a clump: clusters must span
    * at least this arc. A tight ball of detections can accidentally fit
    * a great circle to small RMS; demanding span separates the two.
    */
  val DefaultMinSpanDeg = 1.0

  private def unit(raDeg: Double, decDeg: Double): Array[Double] = {
    val ra = math.toRadians(raDeg)
    val dec = math.toRadians(decDeg)
    Array(math.cos(dec) * math.cos(ra), math.cos(dec) * math.sin(ra), math.sin(dec))
  }

  /** Smallest eigenvector of the symmetric 3×3 scatter matrix Σ v vᵀ —
    * the great-circle pole. Closed-form symmetric-3×3 eigenvalues
    * (trigonometric form of the characteristic cubic) + a cross-product
    * eigenvector: power iteration is unusable here because the two
    * in-plane eigenvalues are nearly equal for a tight chain.
    */
  private def smallestEigvec(vs: Seq[Array[Double]]): Array[Double] = {
    val a = Array.ofDim[Double](3, 3)
    for (v <- vs; i <- 0 until 3; j <- 0 until 3) a(i)(j) += v(i) * v(j)
    val q = (a(0)(0) + a(1)(1) + a(2)(2)) / 3.0
    val p1 = a(0)(1) * a(0)(1) + a(0)(2) * a(0)(2) + a(1)(2) * a(1)(2)
    val p2 = (a(0)(0) - q) * (a(0)(0) - q) + (a(1)(1) - q) * (a(1)(1) - q) +
      (a(2)(2) - q) * (a(2)(2) - q) + 2.0 * p1
    if (p2 < 1e-30) return Array(0.0, 0.0, 1.0) // A = q·I: any direction
    val p = math.sqrt(p2 / 6.0)
    val b = Array.tabulate(3, 3)((i, j) =>
      (a(i)(j) - (if (i == j) q else 0.0)) / p)
    val detB = b(0)(0) * (b(1)(1) * b(2)(2) - b(1)(2) * b(2)(1)) -
      b(0)(1) * (b(1)(0) * b(2)(2) - b(1)(2) * b(2)(0)) +
      b(0)(2) * (b(1)(0) * b(2)(1) - b(1)(1) * b(2)(0))
    val r = math.max(-1.0, math.min(1.0, detB / 2.0))
    val phi = math.acos(r) / 3.0
    val eigMin = q + 2.0 * p * math.cos(phi + 2.0 * math.Pi / 3.0)
    // eigenvector: null space of (A − λI) via the largest cross product
    // of its rows (robust to one-dimensional degeneracy)
    val m = Array.tabulate(3, 3)((i, j) => a(i)(j) - (if (i == j) eigMin else 0.0))
    def cross(u: Array[Double], v: Array[Double]) = Array(
      u(1) * v(2) - u(2) * v(1),
      u(2) * v(0) - u(0) * v(2),
      u(0) * v(1) - u(1) * v(0))
    val cands = Seq(cross(m(0), m(1)), cross(m(0), m(2)), cross(m(1), m(2)))
    val best = cands.maxBy(c => c(0) * c(0) + c(1) * c(1) + c(2) * c(2))
    val n = math.sqrt(best(0) * best(0) + best(1) * best(1) + best(2) * best(2))
    if (n < 1e-30) Array(0.0, 0.0, 1.0) else best.map(_ / n)
  }

  /** Cluster one exposure's detections; returns (candid, trackletLabel). */
  def clusterExposure(
      jd: Double,
      dets: Seq[Detection],
      linkDeg: Double,
      minPoints: Int,
      maxRmsDeg: Double): Seq[(Long, String)] = {
    if (dets.size < minPoints) return Nil
    val vs = dets.map(d => unit(d.ra, d.dec)).toArray
    val n = dets.size
    val cosLink = math.cos(math.toRadians(linkDeg))
    // union-find single-linkage
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r); r }
    def union(i: Int, j: Int): Unit = { val (a, b) = (find(i), find(j)); if (a != b) parent(a) = b }
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val dot = vs(i)(0) * vs(j)(0) + vs(i)(1) * vs(j)(1) + vs(i)(2) * vs(j)(2)
        if (dot >= cosLink) union(i, j)
        j += 1
      }
      i += 1
    }
    val clusters = (0 until n).groupBy(find).values.filter(_.size >= minPoints)
    // great-circle collinearity: RMS distance to best-fit plane, plus a
    // minimum arc span so tight clumps don't sneak through
    val minSpanCos = math.cos(math.toRadians(DefaultMinSpanDeg))
    val kept = clusters.toSeq.flatMap { idxs =>
      val pts = idxs.map(vs)
      val pole = smallestEigvec(pts)
      val rms = math.sqrt(pts.map { v =>
        val s = math.asin(math.abs(v(0) * pole(0) + v(1) * pole(1) + v(2) * pole(2))
          .min(1.0))
        s * s
      }.sum / pts.size)
      val minDot = (for (a <- pts; b <- pts)
        yield a(0) * b(0) + a(1) * b(1) + a(2) * b(2)).min
      if (math.toDegrees(rms) <= maxRmsDeg && minDot <= minSpanCos) Some(idxs)
      else None
    }
    // deterministic label order: by smallest candid in cluster
    val stamp = {
      val micros = ((jd - 2440587.5) * 86400000000.0).toLong
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
      fmt.format(java.time.Instant.ofEpochSecond(micros / 1000000L))
    }
    kept
      .sortBy(idxs => idxs.map(dets(_).candid).min)
      .zipWithIndex
      .flatMap { case (idxs, k) =>
        val label = f"TRCK_${stamp}_$k%02d"
        idxs.map(i => dets(i).candid -> label)
      }
  }

  /** Tracklet labels for a science frame carrying candid +
    * candidate.{jd,ra,dec}: returns (candid, tracklet).
    */
  def detect(
      science: DataFrame,
      linkDeg: Double = DefaultLinkDeg,
      minPoints: Int = DefaultMinPoints,
      maxRmsDeg: Double = DefaultMaxRmsDeg): DataFrame = {
    val spark = science.sparkSession
    import spark.implicits._
    val dets = science
      .select(
        col("candid"),
        col("candidate.jd").as("jd"),
        col("candidate.ra").as("ra"),
        col("candidate.dec").as("dec"))
      // D1: one vote per (exposure, position) before clustering
      .dropDuplicates("jd", "ra", "dec")
      .as[Detection]
    dets
      .groupByKey(_.jd)
      .flatMapGroups { (jd, it) =>
        clusterExposure(jd, it.toSeq, linkDeg, minPoints, maxRmsDeg).iterator
      }
      .toDF("candid", "tracklet")
  }

  /** J1: attach labels via broadcast outer join (ref: bin/ztf/
    * merge.py:81-83); unlabeled alerts get the empty string, matching
    * the reference's schema default.
    */
  def attach(science: DataFrame, labels: DataFrame): DataFrame =
    science
      .join(broadcast(labels), Seq("candid"), "left_outer")
      .withColumn("tracklet", coalesce(col("tracklet"), lit("")))
}
