package graft.core

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults, shared by Verify, Bench
  * and the test suites so every run sees identical semantics.
  */
object GraftSession {

  /** Apply engine defaults to a builder.
    *
    *  - `nanosAsLong`: the driver's `events` table stores `ts` as parquet
    *    TIMESTAMP(NANOS), which Spark 4 refuses to read natively
    *    ([PARQUET_TYPE_ILLEGAL]). With the flag the column surfaces as
    *    LongType epoch-nanoseconds — matching DuckDB's `epoch_ns(ts)`
    *    exactly, with no precision truncation.
    *  - UTC session TZ so date/timestamp literals agree with the oracle.
    *  - AQE on: runtime coalescing + skew-join handling is part of the
    *    100 TB design (SURVEY §4); local runs keep the same plan shape.
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (bucketed-layout operators) land in tmp, not CWD
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for mains/tests. */
  def local(appName: String, cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder().appName(appName).master(s"local[$cpus]"),
      shufflePartitions = math.max(cpus, 4))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
