package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamJoins

/** J3: watermarked stream-stream event-time join over MemoryStreams. */
class StreamJoinSpec extends SparkTestBase {

  test("event-time interval join matches in-window pairs only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(offsetSecs: Int) =
      new java.sql.Timestamp(base.getTime + offsetSecs * 1000L)

    val alerts = MemoryStream[(String, java.sql.Timestamp)]
    val gcn = MemoryStream[(String, java.sql.Timestamp)]
    alerts.addData(("obj1", ts(0)), ("obj2", ts(100)), ("obj3", ts(500)))
    gcn.addData(("obj1", ts(10)), ("obj2", ts(400)), ("obj9", ts(5)))

    val joined = StreamJoins.eventTimeJoin(
      alerts.toDF().toDF("objectId", "alert_time"),
      gcn.toDF().toDF("objectId", "gcn_time"),
      key = "objectId",
      leftTime = "alert_time",
      rightTime = "gcn_time",
      watermark = "10 minutes",
      withinSecs = 60)

    val q = joined.writeStream.format("memory").queryName("mm_join")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ssj_").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val rows = spark.table("mm_join").collect()
      .map(_.getString(0)).sorted.toSeq
    // obj1 within 10s ✓; obj2 300s apart ✗; obj3/obj9 unmatched keys ✗
    assert(rows === Seq("obj1"))
  }
}
