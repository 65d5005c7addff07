package graft.alerts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SpatialFunctions

/** The archive index tables (ref: bin/ztf/archive_index.py:47-300) —
  * specialized projections of the science lake keyed for point lookups:
  * spatial pixel keys, per-class keys, solar-system names, tracklets,
  * and the upper-limit tables built by zipping + exploding the history
  * arrays (X2/X3).
  */
object ArchiveIndex {

  /** Default index: objectId_jd. */
  def objectIdJd(science: DataFrame): DataFrame =
    RowKeys.rowKey(
      science.select(
        col("objectId"),
        col("candidate.jd").as("jd"),
        col("candid")),
      Seq("objectId", "jd"))

  /** Spatial index: pixel<nside>_jd keyed by the healpix cell (X12;
    * ref: bin/ztf/archive_index.py:97-99).
    */
  def pixelIndex(science: DataFrame, nside: Int = 128): DataFrame =
    science
      .select(
        SpatialFunctions.ang2pix(
          col("candidate.ra"), col("candidate.dec"), nside).as("pixel"),
        col("candidate.jd").as("jd"),
        col("objectId"),
        col("candid"))
      .withColumn("row_key", concat_ws("_", col("pixel"), col("jd"), col("objectId")))

  /** Class index with a create_map recode (X4): classification label →
    * compact class id, looked up via getItem on a literal map (the
    * reference's CATS class mapping shape, ref: rubin/science.py:337-351).
    */
  val classIds: Map[String, Int] =
    Map("bogus" -> 0, "variable_candidate" -> 1, "transient_candidate" -> 2)

  def classIndex(science: DataFrame): DataFrame = {
    val idMap = map(
      classIds.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    science
      .select(
        col("classification"),
        col("candidate.jd").as("jd"),
        col("objectId"),
        col("candid"))
      .withColumn("class_id", idMap.getItem(col("classification")))
      .withColumn("row_key",
        concat_ws("_", col("classification"), col("jd"), col("objectId")))
  }

  /** Tracklet index: only tracklet members, keyed tracklet_objectId. */
  def trackletIndex(scienceWithTracklets: DataFrame): DataFrame =
    scienceWithTracklets
      .filter(col("tracklet") =!= "")
      .select(col("tracklet"), col("objectId"), col("candid"))
      .withColumn("row_key", concat_ws("_", col("tracklet"), col("objectId")))

  /** Upper-limit table: zip the parallel history arrays, explode to one
    * row per prior detection (X2/X3; ref: bin/ztf/archive_index.py:
    * 186-264), via a P2-style selectExpr program. `input_file_name`
    * records provenance (X10).
    */
  def upperLimits(science: DataFrame): DataFrame =
    science
      .selectExpr(
        "objectId",
        "candid",
        "explode(arrays_zip(prv_candidates.jd, prv_candidates.magpsf, " +
          "prv_candidates.sigmapsf, prv_candidates.fid)) AS h",
        "input_file_name() AS provenance")
      .selectExpr(
        "objectId",
        "candid",
        "cast(h.jd AS double) AS jd",
        "cast(h.magpsf AS double) AS magpsf",
        "cast(h.sigmapsf AS double) AS sigmapsf",
        "h.fid AS fid",
        "provenance")
      .withColumn("row_key", concat_ws("_", col("objectId"), col("jd")))

  /** All index tables for one night. */
  def all(scienceWithTracklets: DataFrame, nside: Int = 128): Map[String, DataFrame] =
    Map(
      "objectId_jd" -> objectIdJd(scienceWithTracklets),
      s"pixel${nside}_jd_objectId" -> pixelIndex(scienceWithTracklets, nside),
      "class_jd_objectId" -> classIndex(scienceWithTracklets),
      "tracklet_objectId" -> trackletIndex(scienceWithTracklets),
      "upper_objectId_jd" -> upperLimits(scienceWithTracklets))
}
