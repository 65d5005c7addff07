package graft.alerts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SpatialFunctions

/** J2 catalog crossmatch as a healpix-bucketed broadcast join.
  *
  * The reference calls CDS xmatch / an in-memory kd-tree from pandas
  * UDFs per batch (ref: ztf/science.py:57-198). Rebuilt engine-side:
  *
  *  - every alert gets its healpix pixel (codegen'd expression);
  *  - every catalog row is exploded to ALL pixels that can intersect its
  *    match disc (a deterministic tangent-plane sample net — the catalog
  *    is the small/broadcast side, so oversampling costs nothing);
  *  - pixel equi-join (broadcast) prefilters, exact haversine separation
  *    decides.
  *
  * At 100 TB the alert side is never shuffled or exploded — one
  * projected pixel column + a broadcast hash join. This is also the
  * design seed the ANN bucket join reuses (SURVEY §7.5).
  */
object Crossmatch {

  /** Approximate angular size (deg) of a healpix pixel at nside: the
    * mean inter-pixel spacing sqrt(4π/npix).
    */
  def pixelSizeDeg(nside: Int): Double =
    math.toDegrees(math.sqrt(4.0 * math.Pi / (12.0 * nside.toDouble * nside * nside)))

  /** Largest power-of-two nside whose pixel size stays ≥ `factor` × the
    * match radius — keeps each disc inside a handful of pixels.
    */
  def nsideFor(radiusDeg: Double, factor: Double = 4.0, maxNside: Int = 65536): Int = {
    var nside = 1
    while (nside * 2 <= maxNside && pixelSizeDeg(nside * 2) >= factor * radiusDeg)
      nside *= 2
    nside
  }

  /** All pixels that can intersect disc(center, radius): a tangent-plane
    * net of sample points with spacing ≤ 0.3 pixel size over a disc of
    * radius r + pixelDiagonal, deduplicated. Conservative oversampling —
    * a pixel's inscribed circle is ≥ ~0.4 pixel sizes across, so a net
    * this dense cannot skip a pixel whose center lies in the padded
    * disc. Runs on the catalog (small) side only.
    */
  def discCoverPixels(nside: Int, raDeg: Double, decDeg: Double, radiusDeg: Double): Array[Long] = {
    val pix = pixelSizeDeg(nside)
    val pad = radiusDeg + pix // centers of intersecting pixels lie within this
    val step = 0.3 * pix
    val ra0 = math.toRadians(raDeg)
    val dec0 = math.toRadians(decDeg)
    val sinDec0 = math.sin(dec0)
    val cosDec0 = math.cos(dec0)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    val nSteps = math.max(1, math.ceil(pad / step).toInt)
    var i = -nSteps
    while (i <= nSteps) {
      var j = -nSteps
      while (j <= nSteps) {
        val x = i * step
        val y = j * step
        if (math.hypot(x, y) <= pad + step) {
          // gnomonic (tangent-plane) inverse projection
          val xr = math.toRadians(x)
          val yr = math.toRadians(y)
          val rho = math.hypot(xr, yr)
          val (ra, dec) =
            if (rho < 1e-12) (raDeg, decDeg)
            else {
              val c = math.atan(rho)
              val sinC = math.sin(c)
              val cosC = math.cos(c)
              val decS = math.asin(cosC * sinDec0 + yr * sinC * cosDec0 / rho)
              val raS = ra0 + math.atan2(
                xr * sinC, rho * cosDec0 * cosC - yr * sinDec0 * sinC)
              (math.toDegrees(raS), math.toDegrees(decS))
            }
          out += Healpix.ang2pixNest(nside, ra, dec)
        }
        j += 1
      }
      i += 1
    }
    out.toArray
  }

  /** Exact angular separation (degrees) between two (ra, dec) pairs —
    * haversine form, numerically stable at small separations.
    */
  def angularSepDeg(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column = {
    val dLat = radians(dec2 - dec1) / 2
    val dLon = radians(ra2 - ra1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(dec1)) * cos(radians(dec2)) * pow(sin(dLon), 2)
    degrees(lit(2) * asin(sqrt(a)))
  }

  /** Crossmatch `alerts` (any frame with `raCol`/`decCol`) against a
    * catalog frame with columns (`cat_name`, `cat_ra`, `cat_dec`).
    * Returns the alert rows with `cat_name` + `sep_deg` of every match
    * within `radiusDeg` (inner join; left-join wrapper below).
    */
  def crossmatch(
      alerts: DataFrame,
      raCol: Column,
      decCol: Column,
      catalog: DataFrame,
      radiusDeg: Double,
      nsideOpt: Option[Int] = None): DataFrame = {
    val nside = nsideOpt.getOrElse(nsideFor(radiusDeg))
    val cover = udf((ra: Double, dec: Double) =>
      discCoverPixels(nside, ra, dec, radiusDeg))
    val cat = catalog
      .select(
        col("cat_name"),
        col("cat_ra"),
        col("cat_dec"),
        explode(cover(col("cat_ra"), col("cat_dec"))).as("__pix"))
    val withPix = alerts.withColumn(
      "__pix", SpatialFunctions.ang2pix(raCol, decCol, nside))
    withPix
      .join(broadcast(cat), Seq("__pix"))
      .withColumn("sep_deg", angularSepDeg(raCol, decCol, col("cat_ra"), col("cat_dec")))
      .filter(col("sep_deg") <= radiusDeg)
      .drop("__pix", "cat_ra", "cat_dec")
  }

  /** Driver-side healpix index of a SMALL catalog frame, for the
    * in-executor expression crossmatch used by the enrichment spine.
    * The collect is an index-BUILD step on the dim side (exactly like
    * collecting IVF centroids): each catalog row lands in every pixel
    * its match disc can intersect, so alert-side lookup probes one
    * pixel. For catalogs too large to snapshot, use [[nearestLabel]]
    * (healpix-bucketed broadcast join) instead.
    */
  def pixelIndex(
      catalog: DataFrame,
      radiusDeg: Double,
      nsideOpt: Option[Int] = None)
      : (Map[Long, Array[(String, Double, Double)]], Int) = {
    val nside = nsideOpt.getOrElse(nsideFor(radiusDeg))
    val rows = catalog.select(col("cat_name"), col("cat_ra"), col("cat_dec"))
      .collect()
    val m = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[(String, Double, Double)]]
    rows.foreach { r =>
      val entry = (r.getString(0), r.getDouble(1), r.getDouble(2))
      discCoverPixels(nside, entry._2, entry._3, radiusDeg).foreach { p =>
        m.getOrElseUpdate(p,
          scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]) += entry
      }
    }
    (m.view.mapValues(_.toArray).toMap, nside)
  }

  /** [[nearestLabel]] semantics as a pure scalar expression against a
    * collected catalog snapshot: every alert kept, nearest in-radius
    * `cat_name` or "Unknown", ZERO exchanges on the alert side — the
    * spine-friendly form (ref broadcasts catalogs into kd-tree pandas
    * UDFs the same way, ztf/science.py:57-198).
    */
  def nearestLabelExpr(
      ra: Column,
      dec: Column,
      catalog: DataFrame,
      radiusDeg: Double,
      default: String = "Unknown"): Column = {
    val (idx, nside) = pixelIndex(catalog, radiusDeg)
    graft.functions.SpatialFunctions.nearestCatalogLabel(
      ra, dec, idx, nside, radiusDeg, default)
  }

  /** [[pixelIndex]] generalized to carry per-row catalog PROPERTIES:
    * pixel → (rowId, ra, dec) entries plus the aligned value table, for
    * the map-returning expression crossmatch ([[nearestPropsExpr]]).
    * Same small-catalog index-build contract as [[pixelIndex]].
    */
  def propsIndex(
      catalog: DataFrame,
      radiusDeg: Double,
      propCols: Seq[String],
      nsideOpt: Option[Int] = None)
      : (Map[Long, Array[(Int, Double, Double)]], Array[Array[String]], Int) = {
    val nside = nsideOpt.getOrElse(nsideFor(radiusDeg))
    val rows = catalog.select(
      (Seq(col("cat_ra"), col("cat_dec")) ++
        propCols.map(c => col(c).cast("string"))): _*).collect()
    val values = rows.map(r =>
      propCols.indices.map(i =>
        if (r.isNullAt(i + 2)) null else r.getString(i + 2)).toArray)
    val m = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[(Int, Double, Double)]]
    rows.zipWithIndex.foreach { case (r, id) =>
      val (ra, dec) = (r.getDouble(0), r.getDouble(1))
      discCoverPixels(nside, ra, dec, radiusDeg).foreach { p =>
        m.getOrElseUpdate(p,
          scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]) +=
          ((id, ra, dec))
      }
    }
    (m.view.mapValues(_.toArray).toMap, values, nside)
  }

  /** Nearest in-radius catalog row's properties as map<string,string>
    * (all-null-valued map when unmatched) — the reference's `mangrove`
    * column shape (ztf/science.py:192-196), zero exchanges on the
    * alert side.
    */
  def nearestPropsExpr(
      ra: Column,
      dec: Column,
      catalog: DataFrame,
      radiusDeg: Double,
      propCols: Seq[String]): Column = {
    val (idx, values, nside) = propsIndex(catalog, radiusDeg, propCols)
    graft.functions.SpatialFunctions.nearestCatalogMap(
      ra, dec, idx, propCols.toArray, values, nside, radiusDeg)
  }

  /** The reference's enrichment semantics: every alert kept, the nearest
    * in-radius catalog name attached or "Unknown" (ref cdsxmatch column,
    * ztf/science.py:100-154).
    */
  def nearestLabel(
      alerts: DataFrame,
      raCol: Column,
      decCol: Column,
      idCol: Column,
      catalog: DataFrame,
      radiusDeg: Double,
      labelName: String = "cdsxmatch"): DataFrame = {
    val matches = crossmatch(alerts.select(idCol.as("__id"), raCol.as("__ra"), decCol.as("__dec")),
      col("__ra"), col("__dec"), catalog, radiusDeg)
      .groupBy("__id")
      .agg(min_by(col("cat_name"), col("sep_deg")).as(labelName))
    alerts
      .join(matches, idCol === col("__id"), "left")
      .drop("__id")
      .withColumn(labelName, coalesce(col(labelName), lit("Unknown")))
  }
}
