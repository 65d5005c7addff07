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
  private val SidecarName = "_graft_schema.json"

  /** Declared key algebra of a serving table, persisted in the sidecar
    * so readers never guess how the writer salted (the reference's
    * schema row plays the same role for column types,
    * ref: common/hbase_utils.py:220-268).
    */
  final case class TableMeta(
      schemaJson: String,
      keyCols: Seq[String],
      saltSource: String,
      saltDigits: Int)

  /** Write `df` as a serving table keyed by `keyCols`: salted by the
    * last `saltDigits` of `saltSource`, hive-partitioned on the salt,
    * sorted by row key within files (parquet min/max pruning on key).
    * The key algebra is persisted in the sidecar alongside the schema.
    */
  def write(
      df: DataFrame,
      path: String,
      keyCols: Seq[String],
      saltSource: String,
      saltDigits: Int = 2): Unit = {
    require(keyCols.contains(saltSource),
      s"saltSource $saltSource must be a key component (${keyCols.mkString(",")})")
    val keyed = RowKeys
      .rowKey(df, keyCols)
      .withColumn(SaltCol, RowKeys.saltLastDigits(col(saltSource), saltDigits))
    keyed
      .repartition(col(SaltCol))
      .sortWithinPartitions("row_key")
      .write.mode("overwrite")
      .partitionBy(SaltCol)
      .parquet(path)
    writeSidecar(df.sparkSession, path,
      TableMeta(df.schema.json, keyCols, saltSource, saltDigits))
  }

  /** Point lookup: the salt is recomputed from the key component the
    * SIDECAR declares as the salt source — not assumed to be the last
    * component — so the lookup prunes to one salt partition for any key
    * layout. (Key components are underscore-free by the key algebra, as
    * in the reference's HBase keys.)
    */
  def lookup(spark: SparkSession, path: String, keyValue: String): DataFrame = {
    val meta = readMeta(spark, path)
    val parts = keyValue.split("_")
    require(parts.length == meta.keyCols.length,
      s"key '$keyValue' has ${parts.length} components; " +
        s"table declares ${meta.keyCols.mkString("_")}")
    val idx = meta.keyCols.indexOf(meta.saltSource)
    val str = parts(idx)
    val tail =
      if (str.length >= meta.saltDigits) str.takeRight(meta.saltDigits) else str
    val salt = ("0" * (meta.saltDigits - tail.length)) + tail
    spark.read.parquet(path)
      .filter(col(SaltCol) === salt && col("row_key") === keyValue)
  }

  private def writeSidecar(spark: SparkSession, path: String, meta: TableMeta): Unit = {
    // hand-rolled JSON: schemaJson is already JSON; keyCols/saltSource
    // are Spark identifiers (no escaping needed)
    val json =
      s"""{"keyCols":[${meta.keyCols.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""saltSource":"${meta.saltSource}","saltDigits":${meta.saltDigits},""" +
        s""""schema":${meta.schemaJson}}"""
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, SidecarName), true)
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  /** Parse the sidecar back into the declared key algebra. */
  def readMeta(spark: SparkSession, path: String): TableMeta = {
    import org.json4s._
    val json = org.json4s.jackson.JsonMethods.parse(readSchemaRow(spark, path))
    val keyCols = (json \ "keyCols") match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Seq.empty
    }
    val saltSource = (json \ "saltSource") match {
      case JString(s) => s
      case _ => keyCols.last
    }
    val saltDigits = (json \ "saltDigits") match {
      case JInt(n) => n.toInt
      case _ => 2
    }
    val schema = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(json \ "schema"))
    TableMeta(schema, keyCols, saltSource, saltDigits)
  }

  /** Published schema row (raw sidecar contents). */
  def readSchemaRow(spark: SparkSession, path: String): String = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, SidecarName))
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
