package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.BloomDedup

/** Streaming Bloom dedup: duplicates never re-emit — within a batch
  * AND across micro-batch boundaries through the bitmap state — while
  * state stays a constant-size bitmap per shard.
  */
class BloomDedupSpec extends SparkTestBase {

  test("duplicates are dropped across micro-batches; state is bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long, Long, Long)]
    val out = BloomDedup.dedup(
      src.toDF().toDF("shard", "key_hash", "ts", "id"),
      numBits = 1 << 14, numHashes = 4)
    val q = out.writeStream
      .format("memory").queryName("bloomdedup")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_bd_").toString)
      .start()
    try {
      // batch 1: keys 101, 102, 101-dup (same batch)
      src.addData(("s0", 101L, 1L, 1L), ("s0", 102L, 2L, 2L),
        ("s0", 101L, 3L, 3L))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT id FROM bloomdedup").collect()
        .map(_.getLong(0)).toSet
      assert(b1 === Set(1L, 2L), "in-batch dup must drop")

      // batch 2: 101 again (cross-batch dup), 103 fresh
      src.addData(("s0", 101L, 4L, 4L), ("s0", 103L, 5L, 5L))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT id FROM bloomdedup").collect()
        .map(_.getLong(0)).toSet
      assert(b2 === Set(1L, 2L, 5L),
        "cross-batch dup must drop through the bitmap state")
    } finally q.stop()
  }

  test("never-emit-twice holds for adversarial volume; FP rate bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(3)
    val keys = Array.fill(800)(rnd.nextLong())
    val src = MemoryStream[(String, Long, Long, Long)]
    val out = BloomDedup.dedup(
      src.toDF().toDF("shard", "key_hash", "ts", "id"),
      numBits = 1 << 14, numHashes = 4) // 20 bits/key
    val q = out.writeStream
      .format("memory").queryName("bloomdedup2")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_bd2_").toString)
      .start()
    try {
      // every key sent twice across two batches
      src.addData(keys.zipWithIndex.map { case (k, i) =>
        ("s0", k, i.toLong, i.toLong) }.toIndexedSeq: _*)
      q.processAllAvailable()
      src.addData(keys.zipWithIndex.map { case (k, i) =>
        ("s0", k, (1000 + i).toLong, (1000 + i).toLong) }.toIndexedSeq: _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT key_hash FROM bloomdedup2").collect()
        .map(_.getLong(0))
      assert(rows.length == rows.distinct.length, "a key emitted twice")
      // ≥95% of distinct keys survive (FPs may drop a few fresh keys)
      assert(rows.length >= (keys.distinct.length * 95) / 100,
        s"over-dropping: ${rows.length} of ${keys.distinct.length}")
    } finally q.stop()
  }
}
