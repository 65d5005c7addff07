package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `observe()` metrics: in-flight aggregates collected DURING the one
  * real pass — row counts / sums / null tallies without a second scan
  * of a 100 TB input. Batch via the blocking Observation handle;
  * streaming via per-batch observedMetrics on query progress.
  */
class ObserveSpec extends SparkTestBase {

  test("batch Observation collects metrics from the single real pass") {
    val obs = Observation("scan_stats")
    val df = graft.core.Tables.t(spark, sf, "lineitem")
      .observe(obs, count(lit(1)).as("rows"),
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("returns"))
      .filter(col("l_quantity") > 0)
    val kept = df.count()
    val row = obs.get
    assert(row("rows").asInstanceOf[Long] >= kept)
    assert(row("qty").asInstanceOf[Long] > 0L)
    assert(row("returns").asInstanceOf[Long] > 0L)
    // cross-check against an explicit second aggregate
    val want = graft.core.Tables.t(spark, sf, "lineitem")
      .agg(count(lit(1))).collect().head.getLong(0)
    assert(row("rows").asInstanceOf[Long] === want)
  }

  test("streaming observe surfaces per-batch metrics in progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    val q = src.toDF().toDF("v")
      .observe("batch_stats", count(lit(1)).as("n"),
        sum(col("v")).as("s"))
      .writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_obs_").toString)
      .start()
    try {
      src.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("batch_stats")
      assert(m.getAs[Long]("n") === 3L)
      assert(m.getAs[Long]("s") === 6L)
    } finally q.stop()
  }
}
