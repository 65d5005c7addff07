package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialization of a derived artifact shared by
  * several queries — the amortized-index discipline (ref
  * `bin/ztf/archive_index.py:47-300`: derive once, serve many) applied
  * to mid-pipeline artifacts instead of archive tables.
  *
  * Several graph queries derive the SAME similarity-pair table from
  * the corpus (a full gram pass + posting self-join, the dominant cost
  * of each); with per-query `persist()` the pass is still re-paid per
  * query because harness embedders clear the cache between queries.
  * [[getOrBuild]] instead writes the artifact ONCE per (warehouse,
  * dataset) as a managed parquet table and hands every later caller a
  * plain scan of it. At 100 TB this is the difference between six
  * full-corpus gram passes per analytics suite and one.
  *
  * The table name carries a hash of the dataset path, so different
  * SF dirs coexist; the warehouse dir is pid-scoped (GraftSession), so
  * a stale artifact can never leak across JVMs. Correctness contract:
  * `build` must be a PURE function of the dataset dir — the cache is
  * invisible to results, only to cost (DerivedTableSpec asserts both).
  */
object DerivedTable {

  /** Number of cache-miss builds this JVM has paid — observable so
    * tests can assert the build really is amortized. */
  val builds = new AtomicInteger(0)

  private def tableName(artifact: String, datasetDir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(datasetDir).getCanonicalPath.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"g_derived_${artifact}_$h"
  }

  /** Return the materialized `artifact` for `datasetDir`, building it
    * with `build` on first use in this session. Thread-safe: parallel
    * first callers serialize on the build. */
  def getOrBuild(
      spark: SparkSession,
      artifact: String,
      datasetDir: String)(build: => DataFrame): DataFrame = {
    val tbl = tableName(artifact, datasetDir)
    synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        // another SparkSession in this JVM (fresh in-memory catalog,
        // same pid warehouse) may have left the location behind —
        // clear it or saveAsTable refuses with LOCATION_ALREADY_EXISTS
        val loc =
          new Path(spark.conf.get("spark.sql.warehouse.dir"), tbl)
        loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(loc, true)
        build.write.mode("overwrite").format("parquet").saveAsTable(tbl)
        builds.incrementAndGet()
      }
    }
    spark.table(tbl)
  }
}
