package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.alerts.RowKeys

/** S5: the serving layer — the reference's HBase tables re-expressed as
  * salted, key-sorted partitioned Parquet so point lookups prune to one
  * salt partition (HBase stays an optional adapter; same key algebra,
  * ref: common/hbase_utils.py:363-482).
  *
  * A `schema row` sidecar (ref writes a schema_<v> row into every
  * table, common/hbase_utils.py:220-268) is published as a JSON file
  * next to the data; readers skip it by construction instead of
  * filtering `startswith("schema_")` rows out of scans.
  */
object ServingTable {

  val SaltCol = "__salt"

  /** Write `df` as a serving table keyed by `keyCols`: salted by the
    * last `saltDigits` of `saltSource`, hive-partitioned on the salt,
    * sorted by row key within files (parquet min/max pruning on key).
    */
  def write(
      df: DataFrame,
      path: String,
      keyCols: Seq[String],
      saltSource: String,
      saltDigits: Int = 2): Unit = {
    val keyed = RowKeys
      .rowKey(df, keyCols)
      .withColumn(SaltCol, RowKeys.saltLastDigits(col(saltSource), saltDigits))
    keyed
      .repartition(col(SaltCol))
      .sortWithinPartitions("row_key")
      .write.mode("overwrite")
      .partitionBy(SaltCol)
      .parquet(path)
    // schema row sidecar
    val schemaJson = df.schema.json
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_graft_schema.json"), true)
    out.write(schemaJson.getBytes("UTF-8"))
    out.close()
  }

  /** Point lookup: key equality prunes to one salt partition. */
  def lookup(
      spark: SparkSession,
      path: String,
      keyValue: String,
      saltSource: String,
      saltDigits: Int = 2): DataFrame = {
    val salt = {
      val s = keyValue // salt derives from the key's salt-source component
      // callers pass the salt source value via the key itself; recompute
      // the same lpad(substring) the writer used
      val str = s.split("_").last
      val tail = if (str.length >= saltDigits) str.takeRight(saltDigits) else str
      ("0" * (saltDigits - tail.length)) + tail
    }
    spark.read.parquet(path)
      .filter(col(SaltCol) === salt && col("row_key") === keyValue)
  }

  /** Published schema row. */
  def readSchemaRow(spark: SparkSession, path: String): String = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, "_graft_schema.json"))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Y8: batched ingestion — append large static backfills in bounded
    * driver-side batches (ref: rubin/hbase_utils.py:570-596 loads 100
    * files per pass to bound memory).
    */
  def ingestBatched(
      spark: SparkSession,
      files: Seq[String],
      batchSize: Int)(writeBatch: DataFrame => Unit): Int = {
    require(batchSize > 0)
    val batches = files.grouped(batchSize).toSeq
    batches.foreach { group =>
      writeBatch(spark.read.parquet(group: _*))
    }
    batches.size
  }
}
