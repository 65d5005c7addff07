package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.serving.ServingTable

/** The per-science-case reporting layer (SURVEY §3): the reference ships
  * ~16 batch jobs that scan the night's science lake, apply a per-case
  * filter program, reduce to one row per object, and export (serving
  * table / CSV / messaging payload). Every job is the same three-stage
  * shape, so the layer is one generic runner plus small declarative
  * instantiations:
  *
  *   - slsn      (ref: bin/ztf/archive_slsn_candidates.py:235-259):
  *               score threshold → keep the max-ndethist row per object
  *   - hostless  (ref: bin/ztf/archive_hostless.py:126-133): statistic
  *               range cuts + valid-history size cut, plus the night's
  *               global processed-count attached to every row
  *   - anomaly   (ref: bin/ztf/archive_anomaly.py:95-130): top-N most
  *               anomalous per night → isin back → drop stamps → row key
  *   - tnsPush   (ref: bin/ztf/push_to_tns.py:79-96): early-SN filter →
  *               min-per-object → anti-join the already-reported set
  *   - dwarfAgn / earlyTde / blazarStates / symbioticCv / vast /
  *     iaActiveLearning — the remaining six archive_* jobs, same shape
  *     (see each method's reference citation); with these the layer
  *     instantiates every per-science-case report the reference ships.
  *
  * Scale design: each program is filter + one window/agg on the object
  * key — a single keyed shuffle over the already-filtered (small)
  * candidate set; the science lake itself is scanned once with the
  * filters pushed down. The reference instead collects to pandas
  * (`toPandas`) and reduces on the driver — fine at 1e5 alerts/night,
  * not at 1e8; the window form is the distributed equivalent of its
  * `groupby().idxmax()` / `groupby().min()`.
  *
  * Oracle evidence: the same four shapes are registered as q64-q67
  * ([[graft.queries.Reports]]) over the driver tables and checked
  * value-for-value against DuckDB; this layer instantiates them on the
  * alert schema and is covered by ReportsSpec.
  */
object Reports {

  /** One report job: filter program → per-object reduction. Export is a
    * separate step so the same report can go to CSV and serving table. */
  final case class ReportShape(
      name: String,
      program: DataFrame => DataFrame,
      reduce: DataFrame => DataFrame) {
    def run(science: DataFrame): DataFrame = reduce(program(science))
  }

  /** Distributed idxmax: one row per `key`, the row holding the max of
    * `by` (ties broken by `tie` ascending — pandas idxmax keeps the
    * first occurrence; a deterministic tie-break is its distributed
    * analogue). */
  def idxmaxPerKey(df: DataFrame, key: String, by: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(by.desc, tie.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** SLSN candidates: score threshold, then per-object keep the
    * max-ndethist row (the best-sampled light curve), sorted by score
    * for the human report. */
  def slsn(threshold: Double): ReportShape = ReportShape(
    "slsn",
    df => df.filter(col("slsn_score") >= threshold),
    df =>
      idxmaxPerKey(df, "objectId", col("candidate.ndethist"), col("candid"))
        .select(col("objectId"), col("candidate.ra"), col("candidate.dec"),
          col("slsn_score"), col("candidate.ndethist").as("ndethist"),
          col("candidate.jd"), col("candidate.magpsf"))
        .orderBy(col("slsn_score").desc, col("objectId")))

  /** Hostless candidates: a statistic confined to a plausible range
    * (the reference cuts on the science/template KS statistics), at
    * most `maxDetections` valid history points, and the night's global
    * processed count attached to every row (reference: the summed
    * kstest[2] counter). The global count is ONE row cross-joined back
    * with an explicit broadcast — the scalar-attach idiom, no keyed
    * shuffle. */
  def hostless(statCol: Column, lo: Double, hi: Double,
      detCount: Column = col("nalerthist"),
      maxDetections: Int = 20): ReportShape = ReportShape(
    "hostless",
    df => df
      .withColumn("__stat", statCol)
      .filter(col("__stat") >= lo && col("__stat") <= hi)
      .filter(detCount <= maxDetections),
    df => {
      val nProcessed = df.agg(count(lit(1)).as("n_processed"))
      df.crossJoin(broadcast(nProcessed))
        .select(col("objectId"), col("candid"), col("candidate.ra"),
          col("candidate.dec"), col("__stat").as("stat"), col("n_processed"))
    })

  /** Anomaly report: the night's top-N most anomalous alerts, re-selected
    * from the full frame by id (the reference materializes the top-N ids
    * then `isin`s back — here a broadcast semi-join, same semantics
    * without the driver round-trip), stamps dropped, serving row key
    * synthesized. */
  def anomaly(topN: Int = 10): ReportShape = ReportShape(
    "anomaly",
    df => {
      val ids = df
        .select(col("candid"), col("anomaly_score"))
        .orderBy(col("anomaly_score").desc, col("candid"))
        .limit(topN)
        .select("candid")
      df.join(broadcast(ids), Seq("candid"), "left_semi")
    },
    df => df
      .drop("cutoutScience", "cutoutTemplate", "cutoutDifference")
      .withColumn("jd_objectId",
        concat_ws("_", col("candidate.jd").cast("string"), col("objectId"))))

  /** TNS push: early-SN filter (high SN-Ia score, short detection
    * history), reduce to the per-object minimum (the discovery-epoch
    * row, reference `groupby().min()`), then anti-join objects already
    * reported. */
  def tnsPush(pastIds: DataFrame, scoreThreshold: Double = 0.5,
      maxNdethist: Int = 20): ReportShape = ReportShape(
    "tnsPush",
    df => df.filter(
      col("rf_snia_vs_nonia") >= scoreThreshold &&
        col("candidate.ndethist") <= maxNdethist),
    df => df
      .groupBy("objectId")
      .agg(
        min(col("candid")).as("candid"),
        min(col("candidate.jd")).as("discovery_jd"),
        min(col("candidate.magpsf")).as("discovery_mag"),
        min(col("candidate.ndethist")).as("ndethist"))
      .join(broadcast(pastIds), Seq("objectId"), "left_anti"))

  /** Dwarf-AGN association report: remove known asteroids, crossmatch
    * the night against the dwarf-AGN catalog, keep matches only
    * (ref: bin/ztf/archive_dwarf_agn.py:55-64). The catalog is tiny and
    * rides inside the broadcast label expression — the lake side never
    * shuffles; the catalog-name column plays the reference's `manga`. */
  def dwarfAgn(catalog: DataFrame, radiusArcsec: Double = 1.5): ReportShape =
    ReportShape(
      "dwarfAgn",
      df => df
        .filter(col("roid") =!= 3)
        .withColumn("manga", graft.alerts.Crossmatch.nearestLabelExpr(
          col("candidate.ra"), col("candidate.dec"), catalog,
          radiusArcsec / 3600.0, "Unknown"))
        .filter(col("manga") =!= "Unknown"),
      df => df.select(col("objectId"), col("manga"), col("candid"),
        col("candidate.ra"), col("candidate.dec")))

  /** Early-TDE candidates: young rising transients with a high broad-SN
    * score and no catalog counterpart, probabilities extracted and
    * ranked for the notification channel
    * (ref: bin/ztf/archive_early_tde_candidates.py:50-54). */
  def earlyTde(scoreThreshold: Double = 0.8, maxAgeDays: Double = 10.0)
      : ReportShape = ReportShape(
    "earlyTde",
    df => df.filter(
      col("snn_sn_vs_all") >= scoreThreshold &&
        col("candidate.jd") - col("candidate.jdstarthist") <= maxAgeDays &&
        col("cdsxmatch") === "Unknown" && col("roid") === 0),
    df => df
      .select(col("objectId"), col("candid"),
        col("candidate.ra"), col("candidate.dec"),
        col("snn_sn_vs_all").as("tde_score"),
        (col("candidate.jd") - col("candidate.jdstarthist")).as("age_days"))
      .orderBy(col("tde_score").desc, col("objectId")))

  /** Blazar extreme-states report: extract the per-state statistics out
    * of the science map column, keep low-state and high-state alerts as
    * two branches off ONE scan, stamp the serving row key, and carry a
    * state tag (the reference pushes each branch to its own serving
    * table — ref: bin/ztf/archive_extreme_states_blazar.py:106-160). */
  def blazarStates(statsCol: String = "blazar_stats",
      lowMax: Double = 0.5, highMin: Double = 2.0): ReportShape = ReportShape(
    "blazarStates",
    df => df
      .withColumn("instantness_low", col(statsCol).getItem("instantness_low"))
      .withColumn("robustness_low", col(statsCol).getItem("robustness_low"))
      .withColumn("instantness_high", col(statsCol).getItem("instantness_high"))
      .withColumn("robustness_high", col(statsCol).getItem("robustness_high")),
    df => {
      val low = df
        .filter(col("instantness_low") <= lowMax &&
          col("robustness_low") <= lowMax)
        .withColumn("state", lit("low"))
      val high = df
        .filter(col("instantness_high") >= highMin &&
          col("robustness_high") >= highMin)
        .withColumn("state", lit("high"))
      low.unionByName(high)
        .drop("cutoutScience", "cutoutTemplate", "cutoutDifference")
        .withColumn("jd_objectId",
          concat_ws("_", col("candidate.jd").cast("string"), col("objectId")))
    })

  /** Symbiotic / cataclysmic-variable report: crossmatch against the
    * combined "name,category" catalog, keep fast declines
    * (dmag = mag_rate·Δt ≤ −0.5, not from an upper limit), split the
    * label, and route each category to its channel — CVs with the
    * stricter −3 mag cut
    * (ref: bin/ztf/archive_symbiotic_and_cv_stars.py:103-136). */
  def symbioticCv(catalog: DataFrame, deltaTime: Column,
      radiusArcsec: Double = 1.5): ReportShape = ReportShape(
    "symbioticCv",
    df => df
      .withColumn("symbiotic", graft.alerts.Crossmatch.nearestLabelExpr(
        col("candidate.ra"), col("candidate.dec"), catalog,
        radiusArcsec / 3600.0, "Unknown"))
      .filter(col("symbiotic") =!= "Unknown")
      .withColumn("delta_time", deltaTime)
      .withColumn("dmag", col("mag_rate") * col("delta_time"))
      .filter(col("dmag") <= -0.5 && !col("from_upper"))
      .withColumn("name", split(col("symbiotic"), ",").getItem(0))
      .withColumn("cat", split(col("symbiotic"), ",").getItem(1))
      .select(col("objectId"), col("candidate.ra"), col("candidate.dec"),
        col("name"), col("cat"), col("dmag"), col("delta_time")),
    df => {
      val sym = df.filter(col("cat") === "symbiotic_stars")
        .withColumn("channel", lit("@fink_symbiotic_stars"))
      val cvs = df.filter(col("cat") === "cataclysmic_variables" &&
        col("dmag") <= -3.0)
        .withColumn("channel", lit("@fink_cv_stars"))
      sym.unionByName(cvs)
    })

  /** VAST candidates: supernova-like alerts inside the VAST
    * distance/declination footprint — confirmed (TNS counterpart) OR
    * candidate (high SN score), the reference's two-predicate OR filter;
    * `lum_dist` comes out of the mangrove property map cast to float,
    * exactly as the reference casts it
    * (ref: bin/ztf/archive_vast_candidates.py:116-137). */
  def vast(maxLumDist: Double = 160.0, maxDec: Double = 0.0,
      snThreshold: Double = 0.5): ReportShape = ReportShape(
    "vast",
    df => {
      val lum = element_at(col("mangrove"), "lum_dist").cast("float")
      df.filter(
        lum.isNotNull && lum <= maxLumDist &&
          col("candidate.dec") <= maxDec &&
          (col("snn_sn_vs_all") >= snThreshold || col("tns") =!= ""))
    },
    df => df.select(col("objectId"), col("candidate.dec"),
      col("classification"), col("snn_sn_vs_all"), col("tns")))

  /** Ia active-learning loop: rank candidates by distance to the 0.5
    * decision boundary ascending (the most informative next queries for
    * the learner), plus the high-probability early subset descending,
    * each capped at the notification budget; extragalactic-host,
    * declination, age and quality gates first (the reference's c1–c6;
    * `rb` plays its classtar cut)
    * (ref: bin/ztf/archive_ia_active_learning.py:146-196). */
  def iaActiveLearning(egHosts: Seq[String], budget: Int = 30): ReportShape =
    ReportShape(
      "iaActiveLearning",
      df => df
        .withColumn("al_snia_vs_nonia", col("rf_snia_vs_nonia"))
        .withColumn("dist_center", abs(col("al_snia_vs_nonia") - 0.5))
        .withColumn("age_days",
          col("candidate.jd") - col("candidate.jdstarthist"))
        .filter(col("cdsxmatch").isin(egHosts: _*) &&
          col("candidate.dec") < 20.0 && col("age_days") <= 20.0 &&
          col("candidate.drb") > 0.5 && col("candidate.rb") > 0.4 &&
          col("al_snia_vs_nonia") > 0.0),
      df => {
        val cols = Seq(col("objectId"), col("candidate.ra"),
          col("candidate.dec"), col("dist_center"),
          col("al_snia_vs_nonia"), col("age_days"))
        val queried = df
          .orderBy(col("dist_center").asc, col("objectId"))
          .limit(budget).withColumn("branch", lit("queried"))
        val highprob = df
          .filter(col("age_days") <= 10.0 && col("al_snia_vs_nonia") > 0.5)
          .orderBy(col("al_snia_vs_nonia").desc, col("objectId"))
          .limit(budget).withColumn("branch", lit("highprob"))
        queried.select(cols :+ col("branch"): _*)
          .unionByName(highprob.select(cols :+ col("branch"): _*))
      })

  /** CSV export (the reference's human-facing report files). One file:
    * reports are post-reduction (per-object) and small by construction. */
  def exportCsv(report: DataFrame, path: String): Unit =
    report.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Serving-table export (the reference's HBase push, SURVEY §7.1). */
  def exportServing(report: DataFrame, path: String, keyCols: Seq[String],
      saltSource: String): Unit =
    ServingTable.write(report, path, keyCols, saltSource)
}
