package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SpendMonitor

/** transformWithState (Spark 4 arbitrary-state API): per-key state
  * accumulates ACROSS micro-batches in named ValueState handles, under
  * the RocksDB state store provider the API requires.
  */
class TransformWithStateSpec extends SparkTestBase {

  test("running spend accumulates across batches under RocksDB state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = MemoryStream[(Long, Long)]
    val q = SpendMonitor.runningSpend(src.toDS())
      .toDF("user", "n", "total", "mx")
      .writeStream.format("memory").queryName("spend")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_tws_").toString)
      .start()
    try {
      src.addData((1L, 100L), (1L, 250L), (2L, 40L))
      q.processAllAvailable()
      // batch 2: user 1 adds one more; user 2 silent (no emission)
      src.addData((1L, 50L))
      q.processAllAvailable()
      val rows = spark.table("spend").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // batch 1 emissions: lifetime stats after 2 events / 1 event
      assert(rows.contains((1L, 2L, 350L, 250L)), rows.mkString(","))
      assert(rows.contains((2L, 1L, 40L, 40L)), rows.mkString(","))
      // batch 2: user 1's LIFETIME stats (state carried), max unchanged
      assert(rows.contains((1L, 3L, 400L, 250L)), rows.mkString(","))
      // user 2 emitted exactly once (no input in batch 2)
      assert(rows.count(_._1 == 2L) === 1, rows.mkString(","))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
