package graft.alerts

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The nightly statistics job (A1-A4/A3; ref: bin/ztf/
  * archive_statistics.py:36-162): per-class counts, distinct
  * cardinalities, history-depth totals, assembled driver-side into one
  * statistics row (S7 createDataFrame).
  */
object Statistics {

  /** Y7: cache around a multi-aggregation reuse point, always
    * unpersisted (ref: bin/ztf/archive_statistics.py:87).
    */
  def withCached[T](df: DataFrame)(f: DataFrame => T): T = {
    df.cache()
    try f(df)
    finally df.unpersist()
  }

  /** L1: scalar probe — first value of a column (ref: limit(1).collect
    * schema-version probes, rubin/spark_utils.py:44-50).
    */
  def probeScalar(df: DataFrame, column: String): Option[Any] =
    df.select(column).limit(1).collect().headOption.map(_.get(0))

  /** A1: alert count per classification. */
  def classCounts(science: DataFrame): DataFrame =
    science.groupBy("classification").count()

  /** One summary row for the night: A4 counts, A2 distinct counts, A3
    * sum over an array-derived element (total history depth).
    */
  def nightlySummary(science: DataFrame): DataFrame =
    withCached(science) { s =>
      val spark = s.sparkSession
      val row = s.agg(
        count(lit(1)).as("n_alerts"),
        countDistinct(col("objectId")).as("n_objects"),
        countDistinct(col("candidate.fid")).as("n_bands"),
        sum(size(coalesce(col("prv_candidates"), array())))
          .as("n_prv_detections"),
        sum(when(col("classification") === "transient_candidate", 1L)
          .otherwise(0L)).as("n_transients")).collect()(0)
      val schemaVersion =
        probeScalar(s, "schemavsn").map(_.toString).getOrElse("unknown")
      // S7: assemble the statistics row driver-side
      spark.createDataFrame(
        java.util.Arrays.asList(Row(
          schemaVersion,
          row.getLong(0), row.getLong(1), row.getLong(2),
          row.getLong(3), row.getLong(4))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("schemavsn",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_alerts",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_objects",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_bands",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_prv_detections",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_transients",
            org.apache.spark.sql.types.LongType))))
    }
}
