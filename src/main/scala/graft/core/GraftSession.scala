package graft.core

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults, shared by Verify, Bench
  * and the test suites so every run sees identical semantics.
  */
object GraftSession {

  /** Apply engine defaults to a builder.
    *
    *  - `nanosAsLong`: some testdata vintages store `events.ts` as
    *    parquet TIMESTAMP(NANOS), which Spark 4 refuses to read natively
    *    ([PARQUET_TYPE_ILLEGAL]). With the flag that vintage surfaces as
    *    LongType epoch-nanoseconds; [[Tables.t]] then normalizes any
    *    vintage (ns-long, µs NTZ, µs LTZ) to epoch-µs longs.
    *  - UTC session TZ so date/timestamp literals agree with the oracle.
    *  - AQE on: runtime coalescing + skew-join handling is part of the
    *    100 TB design (SURVEY §4); local runs keep the same plan shape.
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (bucketed-layout operators) land in tmp, not CWD;
      // pid-scoped so concurrent JVMs (sbt test vs a Verify run) can't
      // clobber each other's managed-table locations
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse_${ProcessHandle.current().pid()}")
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

  /** Cluster deployment profile: the conf set this engine expects on a
    * real multi-executor cluster (the master/deploy-mode/resource flags
    * come from spark-submit). Everything here scales with cluster size,
    * not data size:
    *
    *  - shuffle.partitions ≈ 2-3× total executor cores (AQE coalesces
    *    down per-stage, so over-partitioning is the safe side; the
    *    skew-join split handles hot keys without manual salting);
    *  - 128 MB scan partitions bound per-task memory no matter how many
    *    files a 100 TB table has;
    *  - broadcast threshold stays conservative — deliberate broadcasts
    *    in this codebase are explicit `broadcast()` hints, so a
    *    mis-estimated dimension can't OOM the executors;
    *  - Kryo + registrationRequired=false: tracklet/science case
    *    classes serialize compactly without a hand-kept registry.
    */
  def clusterConf(totalCores: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> (totalCores * 3).toString,
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (32L * 1024 * 1024).toString,
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.compression.codec" -> "zstd",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Builder for a cluster session: [[configure]] semantics plus the
    * [[clusterConf]] scale settings. */
  def cluster(appName: String, totalCores: Int): SparkSession.Builder = {
    val b = SparkSession.builder().appName(appName)
    clusterConf(totalCores).foldLeft(
      configure(b, shufflePartitions = totalCores * 3)) {
      case (bb, (k, v)) => bb.config(k, v)
    }
  }
}
