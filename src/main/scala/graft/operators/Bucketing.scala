package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed physical layout for shuffle-free co-located joins
  * (SURVEY §2.12): both fact tables are written pre-hashed into the
  * same number of buckets on the join key, so a later equi-join on that
  * key needs NO exchange on either side — the single biggest shuffle a
  * fact-fact pipeline pays at 100 TB is paid once at write time and
  * amortized over every downstream join.
  *
  * `sortBy` the same key so each bucket file is sort-merge-ready; with
  * one file per bucket (and
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, whose
  * one-file precondition [[writeBucketed]] enforces) Spark elides the
  * read-side sort as well, leaving scan → SortMergeJoin with no
  * Exchange anywhere (both shapes asserted by BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table.
    * Idempotent across JVMs: a managed-table location left by a
    * previous session (whose in-memory catalog is gone) is cleared
    * first, or `saveAsTable` refuses with LOCATION_ALREADY_EXISTS.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit = {
    // a qualified name would map to <warehouse>/<db>.<tbl> instead of
    // the catalog's <db>.db/<tbl> location — reject rather than delete
    // the wrong path
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    val known = spark.catalog.tableExists(table)
    spark.sql(s"DROP TABLE IF EXISTS `$table`") // managed: drops data too
    if (!known) {
      // leftover location from a dead session whose catalog is gone
      val loc =
        new Path(spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    // one file per bucket: without the repartition, each writing task
    // emits its own file per bucket and the reader must re-sort before
    // merging
    df.repartition(buckets, df(key))
      .write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Equi-join two tables previously written by [[writeBucketed]] with
    * the same bucket count on `key` — planned without any exchange.
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
