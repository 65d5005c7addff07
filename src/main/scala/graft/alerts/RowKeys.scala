package graft.alerts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P7 row-key synthesis + Y4 key salting for the serving-table layout.
  *
  * The reference's HBase tables are keyed `field1_field2_...` with
  * optional last-N-digit salts to spread monotonically increasing keys
  * across regions (ref: common/hbase_utils.py:271-342, 485-564). The
  * rebuild keeps the same key algebra over partitioned Parquet serving
  * tables, so hot-key avoidance carries to any KV adapter.
  */
object RowKeys {

  /** `concat_ws("_", cols)` row key; fails fast if a component column is
    * missing (same assert as the reference).
    */
  def rowKey(df: DataFrame, cols: Seq[String], keyName: String = "row_key"): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"row key components missing: ${missing.mkString(",")}")
    df.withColumn(keyName, concat_ws("_", cols.map(col): _*))
  }

  /** Y4 salt: the last `n` digits of a numeric-string column, left-padded
    * — uniform for ids with uniform low-order digits.
    */
  def saltLastDigits(c: Column, n: Int): Column =
    lpad(substring(c.cast("string"), -n, n), n, "0")

  /** Salted key: `salt_key` — prefix spreading for scan parallelism. */
  def saltedRowKey(df: DataFrame, saltSource: String, n: Int, cols: Seq[String]): DataFrame =
    rowKey(df, cols).withColumn(
      "salted_key",
      concat_ws("_", saltLastDigits(col(saltSource), n), col("row_key")))
}
