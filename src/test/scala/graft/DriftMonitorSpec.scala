package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DriftMonitor

/** Streaming CUSUM drift: the recursion must stay silent under the
  * reference level, alarm after a sustained shift, and carry its
  * state across micro-batches (the shift split over two batches still
  * accumulates).
  */
class DriftMonitorSpec extends SparkTestBase {

  test("sustained shift alarms; in-control stream stays silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    // ref 1000, slack 50, threshold 500: a +150 shift needs
    // ceil(500 / (150 - 50)) = 5 observations to alarm
    val out = DriftMonitor.cusum(
      src.toDF().toDF("k", "c"), "k", "c",
      refCents = 1000L, slackCents = 50L, threshold = 500L)
    val q = out.writeStream
      .format("memory").queryName("drift")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_drift_").toString)
      .start()
    try {
      // batch 1: "ok" hovers at the reference; "hot" takes 3 of the 5
      // shifted points — not enough yet
      src.addData(
        ("ok", 1000L), ("ok", 1010L), ("ok", 990L),
        ("hot", 1150L), ("hot", 1150L), ("hot", 1150L))
      q.processAllAvailable()
      val after1 = spark.sql(
        "SELECT * FROM drift").collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(4))).toMap
      assert(!after1("ok")._2, "in-control key must not alarm")
      assert(!after1("hot")._2, "3 shifted points < threshold yet")
      assert(after1("hot")._1 === 300L, "G+ = 3 * (150 - 50)")

      // batch 2: two more shifted points cross the threshold — the
      // state carried G+ = 300 across the batch boundary
      src.addData(("hot", 1150L), ("hot", 1150L), ("ok", 1005L))
      q.processAllAvailable()
      val after2 = spark.sql(
        "SELECT * FROM drift").collect()
        .filter(_.getLong(1) >= 5) // latest update per key
        .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(4))).toMap
      assert(after2("hot")._1 === 500L, "G+ accumulated across batches")
      assert(!after2("hot")._2, "G+ == h is the boundary, not yet an alarm")
      // one more point tips it strictly over
      src.addData(("hot", 1150L))
      q.processAllAvailable()
      val fin = spark.sql("SELECT * FROM drift").collect()
        .filter(_.getString(0) == "hot").maxBy(_.getLong(1))
      assert(fin.getLong(2) === 600L && fin.getBoolean(4),
        "sustained shift must alarm")
      // downward drift symmetric: G- grows on a level drop
      src.addData(("low", 800L), ("low", 800L), ("low", 800L),
        ("low", 800L))
      q.processAllAvailable()
      val low = spark.sql("SELECT * FROM drift").collect()
        .filter(_.getString(0) == "low").maxBy(_.getLong(1))
      assert(low.getLong(3) === 600L && low.getBoolean(4),
        "G- = 4 * (200 - 50) = 600 > 500 alarms")
    } finally q.stop()
  }
}
