package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Stateful

/** mapGroupsWithState: per-key state must accumulate ACROSS
  * micro-batches (the state store carries it), not reset per batch.
  */
class StatefulSpec extends SparkTestBase {

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
}
