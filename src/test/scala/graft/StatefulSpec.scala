package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Stateful

/** mapGroupsWithState: per-key state must accumulate ACROSS
  * micro-batches (the state store carries it), not reset per batch.
  */
class StatefulSpec extends SparkTestBase {

  test("streaming curation: gates drop, PII redacts, content dedup crosses batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val out = graft.streaming.CurationStream.pipeline(
      src.toDF().toDF("doc_id", "text"))
    val q = out.writeStream
      .format("memory").queryName("curated")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_curate_").toString)
      .start()
    try {
      src.addData(
        (1L, "the quick brown fox jumps over a dog mail user1@mail.net ok"),
        (2L, "1 2 3 4 5 6 7 8 9"), // alpha_ratio 0 → gated
        (3L, "too short"))          // n_tokens < 5 → gated
      q.processAllAvailable()
      // LATER batch: same content modulo case/whitespace/PII-span —
      // normalizes to the same fingerprint → stateful dedup drops it
      src.addData(
        (4L, "THE  quick brown fox jumps over a dog mail user1@mail.net ok"),
        (5L, "an entirely different document with enough letters here"))
      q.processAllAvailable()
      val rows = spark.table("curated").collect()
      val ids = rows.map(_.getAs[Long]("doc_id")).toSet
      assert(ids === Set(1L, 5L), s"kept $ids")
      val kept1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
        .getAs[String]("text")
      assert(kept1.contains("[EMAIL]") && !kept1.contains("user1@mail.net"),
        s"PII not redacted: $kept1")
    } finally q.stop()
  }

  test("running counts accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val counts = Stateful.runningCounts(src.toDF().toDF("objectId"), "objectId")
    val q = counts.writeStream
      .format("memory").queryName("running_counts")
      .outputMode(Stateful.RequiredOutputMode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_state_").toString)
      .start()
    try {
      src.addData("a", "a", "b")
      q.processAllAvailable()
      val afterB1 = spark.table("running_counts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(afterB1 === Set("a" -> 2L, "b" -> 1L))

      src.addData("a", "c")
      q.processAllAvailable()
      val all = spark.table("running_counts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // update mode appends the new per-key totals; 'a' must now ALSO
      // show the accumulated 3 (state crossed the batch boundary)
      assert(all.contains("a" -> 3L), s"state did not accumulate: $all")
      assert(all.contains("c" -> 1L))
    } finally q.stop()
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked tumbling window: aggregates emit on close, late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, String)]
    val out = Stateful.windowedCounts(
      src.toDF().toDF("ts", "k"), "ts", "k",
      width = "10 minutes", slide = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_win_").toString)
      .start()
    try {
      src.addData(
        (ts("2026-01-01 00:01:00"), "a"),
        (ts("2026-01-01 00:02:00"), "a"),
        (ts("2026-01-01 00:03:00"), "b"))
      q.processAllAvailable()
      // advance the watermark beyond 00:10 + 5min so the window closes
      src.addData((ts("2026-01-01 00:21:00"), "a"))
      q.processAllAvailable()
      // a LATE row for the closed window: must be dropped, not revived
      src.addData((ts("2026-01-01 00:04:00"), "a"))
      q.processAllAvailable()
      src.addData((ts("2026-01-01 00:40:00"), "z"))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3)))
        .toSet
      assert(rows.contains(("2026-01-01 00:00:00.0", "a", 2L)),
        s"window [00:00,00:10) for a should have closed with 2, got $rows")
      assert(rows.contains(("2026-01-01 00:00:00.0", "b", 1L)))
      // the late 00:04 row must NOT have produced a second emission
      assert(rows.count(_._2 == "a") <= 2, s"late row revived a window: $rows")
    } finally q.stop()
  }

  test("session windows close after the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, String)]
    val out = Stateful.sessionCounts(
      src.toDF().toDF("ts", "k"), "ts", "k",
      gap = "5 minutes", watermark = "1 minute")
    val q = out.writeStream
      .format("memory").queryName("sess_counts")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sess_").toString)
      .start()
    try {
      // two bursts 20 minutes apart: two sessions for key a
      src.addData(
        (ts("2026-01-01 00:00:00"), "a"),
        (ts("2026-01-01 00:02:00"), "a"),
        (ts("2026-01-01 00:20:00"), "a"))
      q.processAllAvailable()
      src.addData((ts("2026-01-01 01:00:00"), "a")) // advances watermark
      q.processAllAvailable()
      src.addData((ts("2026-01-01 02:00:00"), "z"))
      q.processAllAvailable()
      val sessions = spark.table("sess_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
          r.getString(2), r.getLong(3)))
        .filter(_._3 == "a").toSet
      // burst 1: 00:00-00:02 + 5min gap → closes at 00:07, n=2
      assert(sessions.exists(s => s._1 == "2026-01-01 00:00:00.0"
        && s._2 == "2026-01-01 00:07:00.0" && s._4 == 2L), sessions.toString)
      // burst 2: single event at 00:20 → closes at 00:25, n=1
      assert(sessions.exists(s => s._1 == "2026-01-01 00:20:00.0"
        && s._4 == 1L), sessions.toString)
    } finally q.stop()
  }

  test("streaming dedup drops re-deliveries across batches; state expires past watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, String)]
    val out = Stateful.streamingDedup(
      src.toDF().toDF("ts", "k"), Seq("k"),
      withinWatermark = Some(("ts", "10 minutes")))
    val q = out.writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_dedup_").toString)
      .start()
    try {
      src.addData((ts("2026-01-01 00:00:00"), "a"), (ts("2026-01-01 00:00:30"), "a"))
      q.processAllAvailable()
      // re-delivery in a LATER batch, inside the watermark: dropped
      src.addData((ts("2026-01-01 00:01:00"), "a"), (ts("2026-01-01 00:02:00"), "b"))
      q.processAllAvailable()
      val early = spark.table("dedup_stream").collect()
        .map(r => r.getString(1))
      assert(early.count(_ == "a") === 1, s"re-delivery not dropped: ${early.toSeq}")
      assert(early.count(_ == "b") === 1)
      // advance event time far beyond the watermark window: key state
      // for 'a' has expired, so a fresh 'a' is emitted again (bounded
      // state by design, not a correctness bug)
      src.addData((ts("2026-01-01 01:00:00"), "c"))
      q.processAllAvailable()
      src.addData((ts("2026-01-01 01:01:00"), "a"))
      q.processAllAvailable()
      val all = spark.table("dedup_stream").collect().map(_.getString(1))
      assert(all.count(_ == "a") === 2,
        s"expired key must re-emit (bounded state): ${all.toSeq}")
    } finally q.stop()
  }
}
