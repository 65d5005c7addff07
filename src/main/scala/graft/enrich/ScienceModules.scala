package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.alerts.AlertFunctions

/** U1/§2.14: the science-module pipeline — an ordered sequence of
  * column-in/column-out enrichment stages, mirroring
  * `apply_science_modules` (ref: fink_broker/ztf/science.py:201-436).
  *
  * The engine contract is exactly the reference's: each module consumes
  * columns, appends columns, and never shuffles — the whole enrichment
  * is one narrow pipeline per micro-batch. ML scorers plug in behind
  * [[Scorer]]; the built-ins are deterministic analytic stand-ins (the
  * reference itself ships a --noscience mode with the same shape, ref:
  * bin/ztf/raw2science.py:97-104).
  */
object ScienceModules {

  /** A pluggable scorer: named output column from input columns. */
  trait Scorer extends Serializable {
    def name: String
    def apply(df: DataFrame): Column
  }

  /** Magnitude evolution rate over the history arrays (needs
    * cmagpsf/cjd from concatCol): Δmag/Δday between first and last
    * detection — the shape of the reference's magnitude_rate module.
    */
  object MagnitudeRate extends Scorer {
    val name = "mag_rate"
    def apply(df: DataFrame): Column = {
      val dm = element_at(col("cmagpsf"), -1) - element_at(col("cmagpsf"), 1)
      val dt = element_at(col("cjd"), -1) - element_at(col("cjd"), 1)
      when(size(col("cjd")) >= 2 && dt > 0, dm.cast("double") / dt)
        .otherwise(lit(0.0))
    }
  }

  /** Detection-count feature (the reference's nalerthist). */
  object NAlertHist extends Scorer {
    val name = "nalerthist"
    def apply(df: DataFrame): Column = size(col("cmagpsf")).cast("long")
  }

  /** Deterministic transient score from mean historical magnitude. */
  object TransientScore extends Scorer {
    val name = "rf_snia_vs_nonia"
    def apply(df: DataFrame): Column =
      AlertFunctions.deterministicScore(col("cmagpsf"))
  }

  /** Anomaly score: dispersion of the magnitude history (stub for the
    * reference's anomaly_score module; same column contract).
    */
  object AnomalyScore extends Scorer {
    val name = "anomaly_score"
    def apply(df: DataFrame): Column = {
      val n = size(col("cmagpsf"))
      val mean = aggregate(col("cmagpsf"), lit(0.0),
        (acc, x) => acc + x.cast("double")) / n
      val ssq = aggregate(col("cmagpsf"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")) / n
      when(n >= 2, sqrt(greatest(ssq - mean * mean, lit(0.0)))).otherwise(lit(0.0))
    }
  }

  val defaultScorers: Seq[Scorer] =
    Seq(MagnitudeRate, NAlertHist, TransientScore, AnomalyScore)

  /** History fields every module depends on (ref builds ~11; these are
    * the ones the built-in scorers consume).
    */
  val historyFields: Seq[String] = Seq("magpsf", "sigmapsf", "jd", "fid")

  /** The full enrichment: concat histories → scorers → classification →
    * drop temporaries. One narrow plan, no UDFs, no shuffles.
    */
  def apply(df: DataFrame, scorers: Seq[Scorer] = defaultScorers): DataFrame = {
    val withHist = AlertFunctions.concatCols(df, historyFields)
    val scored = scorers.foldLeft(withHist)((d, s) => d.withColumn(s.name, s(d)))
    scored
      .withColumn("classification",
        AlertFunctions.classify(col("rf_snia_vs_nonia"), col("nalerthist") - 1))
      .drop(historyFields.map("c" + _): _*)
  }
}
