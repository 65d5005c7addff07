package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Native `session_window` streaming aggregation — the built-in gap
  * sessionizer (complement of the batch `operators/Sessionize`, which
  * q47 oracles): sessions grow while events arrive within the gap,
  * split when the gap is exceeded, MERGE when a late-but-in-watermark
  * event bridges two open sessions, and only close once the watermark
  * passes the session end. Pinned here because session state is the
  * one streaming aggregation mode with dynamic (per-row-extended)
  * window bounds — a restart-safe 100 TB sessionization needs exactly
  * these semantics from the state store.
  */
class SessionWindowSpec extends SparkTestBase {

  test("gap sessions: grow within gap, split beyond it, close on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)] // (user, epoch-seconds)
    val sessions = src.toDF().toDF("user", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .groupBy(col("user"), session_window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user"),
        unix_timestamp(col("session_window.start")).as("w_start"),
        unix_timestamp(col("session_window.end")).as("w_end"),
        col("n_events"))
    val q = sessions.writeStream
      .format("memory").queryName("sess")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sess_").toString)
      .start()
    try {
      // user a: two events 20 s apart → ONE session [100, 150);
      // user b: two events 40 s apart → TWO sessions
      src.addData(("a", 100L), ("a", 120L), ("b", 100L), ("b", 140L))
      q.processAllAvailable()
      // advance the watermark far past every session end so they close
      src.addData(("c", 1000L))
      q.processAllAvailable()
      src.addData(("c", 2000L))
      q.processAllAvailable()
      val got = spark.table("sess")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.contains(("a", 100L, 150L, 2L)), s"got $got")
      assert(got.contains(("b", 100L, 130L, 1L)), s"got $got")
      assert(got.contains(("b", 140L, 170L, 1L)), s"got $got")
    } finally q.stop()
  }

  test("a bridging event merges two open sessions before close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val sessions = src.toDF().toDF("user", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes") // generous: nothing closes early
      .groupBy(col("user"), session_window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user"),
        unix_timestamp(col("session_window.start")).as("w_start"),
        unix_timestamp(col("session_window.end")).as("w_end"),
        col("n_events"))
    val q = sessions.writeStream
      .format("memory").queryName("sess_merge")
      .outputMode("complete")
      .start()
    try {
      // two sessions 50 s apart (gap 30 s: separate)...
      src.addData(("a", 100L), ("a", 150L))
      q.processAllAvailable()
      val before = spark.table("sess_merge").count()
      assert(before === 2L, s"expected 2 open sessions, got $before")
      // ...then a bridge at 125 s joins them into ONE [100, 180)
      src.addData(("a", 125L))
      q.processAllAvailable()
      val got = spark.table("sess_merge")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === Set(("a", 100L, 180L, 3L)), s"got $got")
    } finally q.stop()
  }
}
