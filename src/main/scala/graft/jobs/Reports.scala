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
