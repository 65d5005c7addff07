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

  /** History table: zip the parallel history arrays, explode to one
    * row per prior detection (X2/X3; ref: bin/ztf/archive_index.py:
    * 186-264), via a P2-style selectExpr program. `input_file_name`
    * records provenance (X10). Feeds [[upperLimits]]/[[upperValid]].
    */
  def historyRows(science: DataFrame): DataFrame =
    science
      .selectExpr(
        "objectId",
        "candid",
        "explode(arrays_zip(prv_candidates.jd, prv_candidates.magpsf, " +
          "prv_candidates.sigmapsf, prv_candidates.fid, " +
          "prv_candidates.diffmaglim, prv_candidates.rb, " +
          "prv_candidates.nbad, prv_candidates.magnr, " +
          "prv_candidates.sigmagnr, prv_candidates.isdiffpos, " +
          "prv_candidates.distnr)) AS h",
        "input_file_name() AS provenance")
      .selectExpr(
        "objectId",
        "candid",
        "cast(h.jd AS double) AS jd",
        "cast(h.magpsf AS double) AS magpsf",
        "cast(h.sigmapsf AS double) AS sigmapsf",
        "h.fid AS fid",
        "cast(h.diffmaglim AS double) AS diffmaglim",
        "cast(h.rb AS double) AS rb",
        "h.nbad AS nbad",
        "cast(h.magnr AS double) AS magnr",
        "cast(h.sigmagnr AS double) AS sigmagnr",
        "h.isdiffpos AS isdiffpos",
        "cast(h.distnr AS double) AS distnr",
        "provenance")
      .withColumn("row_key", concat_ws("_", col("objectId"), col("jd")))

  /** Last-history-entry status gates (the observable contract of the
    * reference's check_status_last_prv_candidates, called at
    * bin/ztf/archive_index.py:172-174 and 209-211): `upper` = the most
    * recent history entry is an upper limit (null magpsf);
    * `uppervalid` = it is a real measurement that fails the quality
    * cuts (rb/nbad).
    */
  def withLastPrvStatus(science: DataFrame): DataFrame = {
    // try_element_at: the `hasPrv &&` short-circuit does NOT protect a
    // strict element_at under ANSI — codegen subexpression elimination
    // hoists the shared element_at above the guard and throws on empty
    // history arrays
    val last = try_element_at(col("prv_candidates"), lit(-1))
    val hasPrv = size(coalesce(col("prv_candidates"),
      array().cast(science.schema("prv_candidates").dataType))) > 0
    science
      .withColumn("upper", hasPrv && last.getField("magpsf").isNull)
      .withColumn("uppervalid",
        hasPrv && last.getField("magpsf").isNotNull &&
          !(last.getField("rb") >= 0.55 && last.getField("nbad") === 0))
  }

  /** Upper-limit table (ref: archive_index.py:171-207): alerts whose
    * latest history entry is an upper limit → exploded history rows →
    * keep the NULL-magpsf (non-detection) rows, drop the all-null
    * magnitude columns.
    */
  def upperLimits(science: DataFrame): DataFrame =
    historyRows(withLastPrvStatus(science).filter(col("upper")))
      .filter(col("magpsf").isNull)
      .drop("magpsf", "sigmapsf", "rb", "nbad",
        "magnr", "sigmagnr", "isdiffpos", "distnr")

  /** Valid-but-noisy table (ref: archive_index.py:208-264, SURVEY §7.4
    * hard-part 4): alerts whose latest history entry is a measurement
    * failing the quality cuts → exploded history rows → keep NOISY
    * measurements (NOT(rb>=0.55 AND nbad==0) AND magpsf present), then
    * drop the quality columns themselves.
    */
  def upperValid(science: DataFrame): DataFrame =
    historyRows(withLastPrvStatus(science).filter(col("uppervalid")))
      .filter(
        !(col("rb") >= 0.55 && col("nbad") === 0) && col("magpsf").isNotNull)
      .drop("rb", "nbad")

  /** Solar-system index (ref: archive_index.py:153-161): MPC-matched
    * alerts only (roid == 3), keyed ssnamenr_jd.
    */
  def ssnamenrIndex(science: DataFrame): DataFrame =
    RowKeys.rowKey(
      science
        .filter(col("roid") === 3)
        .select(
          col("candidate.ssnamenr").as("ssnamenr"),
          col("candidate.jd").as("jd"),
          col("objectId"),
          col("candid")),
      Seq("ssnamenr", "jd"))

  /** TNS index (ref: archive_index.py:141-152): alerts with a TNS
    * counterpart only (tns != ""), keyed tns_jd_objectId.
    */
  def tnsIndex(science: DataFrame): DataFrame =
    RowKeys.rowKey(
      science
        .filter(col("tns") =!= "")
        .select(
          col("tns"),
          col("candidate.jd").as("jd"),
          col("objectId"),
          col("candid")),
      Seq("tns", "jd", "objectId"))

  /** Cutouts/images index (ref: bin/ztf/archive_images.py:49-80): the
    * lake row's PROVENANCE — objectId, jd, candid plus the hdfs file
    * path from input_file_name (X10) — keyed objectId_jd, so a cutout
    * fetch resolves to its parquet file without storing image bytes in
    * the serving table twice.
    */
  def imagesIndex(science: DataFrame): DataFrame =
    RowKeys.rowKey(
      science.select(
        col("objectId"),
        col("candidate.jd").as("jd"),
        col("candid"),
        input_file_name().as("hdfs_path")),
      Seq("objectId", "jd"))

  /** All 9 index tables for one night (ref builds the same set,
    * bin/ztf/archive_index.py:47-300 + archive_images.py).
    */
  def all(scienceWithTracklets: DataFrame, nside: Int = 128): Map[String, DataFrame] =
    Map(
      "objectId_jd" -> objectIdJd(scienceWithTracklets),
      s"pixel${nside}_jd_objectId" -> pixelIndex(scienceWithTracklets, nside),
      "class_jd_objectId" -> classIndex(scienceWithTracklets),
      "tracklet_objectId" -> trackletIndex(scienceWithTracklets),
      "upper_objectId_jd" -> upperLimits(scienceWithTracklets),
      "uppervalid_objectId_jd" -> upperValid(scienceWithTracklets),
      "ssnamenr_jd" -> ssnamenrIndex(scienceWithTracklets),
      "tns_jd_objectId" -> tnsIndex(scienceWithTracklets),
      "cutouts_objectId_jd" -> imagesIndex(scienceWithTracklets))
}
