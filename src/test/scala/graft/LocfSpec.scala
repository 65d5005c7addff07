package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Locf

/** Streaming LOCF: the carry must repair NULLs within a batch in
  * (ts, id) order, survive the batch boundary through the state
  * store, and emit the -1 sentinel before any observation exists.
  */
class LocfSpec extends SparkTestBase {

  test("carry repairs across micro-batches; sentinel before first obs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long, Long, Option[Long])]
    val out = Locf.forwardFill(
      src.toDF().toDF("k", "ts", "id", "v"), "k", "ts", "id", "v")
    val q = out.writeStream
      .format("memory").queryName("locf")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_locf_").toString)
      .start()
    try {
      // batch 1: "a" starts MISSING (sentinel), then 10, then missing
      // (carries 10); "b" never observes (all sentinel)
      src.addData(
        ("a", 1L, 1L, None), ("a", 2L, 2L, Some(10L)), ("a", 3L, 3L, None),
        ("b", 1L, 4L, None))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT * FROM locf").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getBoolean(4))).toMap
      assert(b1(("a", 1L)) === (-1L, true), "sentinel before first obs")
      assert(b1(("a", 2L)) === (10L, false))
      assert(b1(("a", 3L)) === (10L, true), "carry within batch")
      assert(b1(("b", 1L)) === (-1L, true))

      // batch 2: "a" still missing — the 10 must carry ACROSS the
      // batch boundary; then a new obs 20 resets the carry
      src.addData(("a", 4L, 5L, None), ("a", 5L, 6L, Some(20L)),
        ("a", 6L, 7L, None))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT * FROM locf").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getBoolean(4))).toMap
      assert(b2(("a", 4L)) === (10L, true), "carry across batches")
      assert(b2(("a", 5L)) === (20L, false))
      assert(b2(("a", 6L)) === (20L, true))
    } finally q.stop()
  }
}
