package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.alerts.Flatten

/** Versioned schema registry (§1.3/§1.6 of SURVEY): the reference
  * stamps an `lsst_schema_version` column at ingest and reads it back
  * to drive version-dependent processing (ref:
  * rubin/decoding_utils.py:120-126, rubin/spark_utils.py:27-52).
  *
  * Here: register StructTypes per (survey, version), stamp frames,
  * probe the stamp with a limit(1) scalar read, dispatch handlers by
  * version, and upgrade drifted frames onto the latest schema through
  * [[graft.alerts.Flatten.conform]] (typed defaults for added fields).
  */
object SchemaRegistry {

  val VersionCol = "graft_schema_version"

  private val registry =
    scala.collection.concurrent.TrieMap[(String, String), StructType]()

  def register(survey: String, version: String, schema: StructType): Unit =
    registry.put((survey, version), schema)

  def get(survey: String, version: String): Option[StructType] =
    registry.get((survey, version))

  /** Versions for a survey in registration-string order. */
  def versions(survey: String): Seq[String] =
    registry.keys.collect { case (s, v) if s == survey => v }.toSeq.sorted

  def latest(survey: String): Option[(String, StructType)] =
    versions(survey).lastOption.map(v => v -> registry((survey, v)))

  /** Stamp the version column at ingest. */
  def stamp(df: DataFrame, version: String): DataFrame =
    df.withColumn(VersionCol, lit(version))

  /** Probe the stamped version from data (L1-style limit(1) read). */
  def probeVersion(df: DataFrame): Option[String] =
    if (!df.columns.contains(VersionCol)) None
    else df.select(VersionCol).limit(1).collect().headOption.map(_.getString(0))

  /** Version-dependent processing: apply the handler registered for the
    * frame's stamped version (the reference picks per-version selectExpr
    * programs the same way).
    */
  def dispatch(df: DataFrame)(handlers: Map[String, DataFrame => DataFrame]): DataFrame = {
    val v = probeVersion(df).getOrElse(
      sys.error(s"frame carries no $VersionCol column"))
    handlers.getOrElse(v,
      sys.error(s"no handler for schema version $v"))(df)
  }

  /** Conform a drifted frame onto a registered schema: present columns
    * cast, missing columns typed-default-filled; returns the upgraded
    * frame stamped with the target version plus the filled column names.
    */
  def upgradeTo(df: DataFrame, survey: String, version: String): (DataFrame, Seq[String]) = {
    val target = registry.getOrElse((survey, version),
      sys.error(s"unknown schema $survey/$version"))
    val (conformed, missing) = Flatten.conform(df.drop(VersionCol), target)
    (stamp(conformed, version), missing)
  }
}
