package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Throttle

/** Streaming throttle: emission decisions must depend on the previous
  * SURVIVOR (not the previous row), survive micro-batch boundaries
  * through the state store, and agree with the single-pass batch fold
  * for any batch chopping.
  */
class ThrottleSpec extends SparkTestBase {

  test("per-key debounce across micro-batches matches the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long, Long)]
    val out = Throttle.throttle(
      src.toDF().toDF("k", "ts", "id"), "k", "ts", "id", minGapUs = 10L)
    val q = out.writeStream
      .format("memory").queryName("throttle")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_thr_").toString)
      .start()
    try {
      // batch 1: a@0 emits; a@5 suppressed (gap 5 < 10); a@12 emits
      // (12-0 >= 10 vs the EMITTED 0, not the suppressed 5 — a lag
      // would wrongly pass a@5's follower); b@3 emits
      val batch1 = Seq(("a", 0L, 1L), ("a", 5L, 2L), ("a", 12L, 3L),
        ("b", 3L, 4L))
      src.addData(batch1: _*)
      q.processAllAvailable()
      val b1 = spark.sql("SELECT * FROM throttle").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(b1 === Set(("a", 0L, 1L, 0L), ("a", 12L, 3L, 1L),
        ("b", 3L, 4L, 0L)))

      // batch 2: a@15 suppressed (15-12 < 10 ACROSS the boundary);
      // a@25 emits carrying the suppressed count
      src.addData(("a", 15L, 5L), ("a", 25L, 6L))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT * FROM throttle").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(b2 === b1 + (("a", 25L, 6L, 1L)))

      // the full event sequence through the batch reference gives the
      // same survivors — chopping into micro-batches changed nothing
      val all = batch1 ++ Seq(("a", 15L, 5L), ("a", 25L, 6L))
      assert(Throttle.batchReference(all, 10L).toSet === b2)
    } finally q.stop()
  }

  test("batch reference: survivor-relative gaps, not row-relative") {
    // 0 emits; 6 suppressed; 11 emits (vs 0); 16 suppressed (vs 11);
    // 30 emits. A lag-based filter would emit 16 (16-11 >= ... no —
    // it would emit 6's follower patterns); the fold must not.
    val rows = Seq(("k", 0L, 1L), ("k", 6L, 2L), ("k", 11L, 3L),
      ("k", 16L, 4L), ("k", 30L, 5L))
    assert(Throttle.batchReference(rows, 10L) ===
      Seq(("k", 0L, 1L, 0L), ("k", 11L, 3L, 1L), ("k", 30L, 5L, 1L)))
  }
}
