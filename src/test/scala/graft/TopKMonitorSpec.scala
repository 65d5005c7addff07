package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.TopKMonitor

/** Cross-batch Misra-Gries monitoring: the running summary merges
  * batch summaries with the mergeable-summaries rule, so after B
  * batches the lower bounds are within N_total/(k+1) of the true
  * cumulative counts and the dominant key ranks first.
  */
class TopKMonitorSpec extends SparkTestBase {
  import spark.implicits._

  test("running top-k across micro-batches: bounds + dominant key") {
    val src = Files.createTempDirectory("tk_src_").toString
    val metrics = Files.createTempDirectory("tk_met_").toString
    val ckpt = Files.createTempDirectory("tk_ck_").toString
    // two files on disk before start; maxFilesPerTrigger=1 makes them
    // two sequential micro-batches of ONE query run (the running
    // summary deliberately lives only within a run)
    val batch0 = Seq.fill(30)("hot") ++ Seq.fill(15)("warm") ++
      (0 until 15).map(i => s"u$i")
    val batch1 = Seq.fill(20)("hot") ++ Seq.fill(5)("cold") ++
      (0 until 10).map(i => s"v$i")
    batch0.toDF("k").coalesce(1).write.mode("append").parquet(src)
    batch1.toDF("k").coalesce(1).write.mode("append").parquet(src)

    val stream = spark.readStream.schema("k string")
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = TopKMonitor.start(stream, "k", k = 4, metrics, ckpt)
    try q.processAllAvailable()
    finally q.stop()

    // batch_id is now a PARTITION column (idempotent dynamic
    // overwrite per batch) — inference types it int, cast back
    val snaps = spark.read.parquet(metrics)
      .withColumn("batch_id", col("batch_id").cast("long"))
    val batches = snaps.select("batch_id").distinct().count()
    assert(batches === 2, "one snapshot per micro-batch")
    // the idempotency contract is structural: each batch owns its own
    // batch_id= partition, so a checkpoint replay overwrites rather
    // than duplicates
    val dirs = new java.io.File(metrics).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("batch_id=0", "batch_id=1"), dirs.toString)
    // per-batch snapshots are bounded by k
    snaps.groupBy("batch_id").count().collect()
      .foreach(r => assert(r.getLong(1) <= 4))

    val last = snaps.filter(col("batch_id") ===
        snaps.agg(max("batch_id")).head().getLong(0))
      .collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("lb_count"), r.getAs[Long]("rank"))).toMap
    val exact = (batch0 ++ batch1).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = (batch0.length + batch1.length).toLong
    val slack = n / 5 // k+1 = 5
    // the dominant key survives, ranks first, and its bound is honest
    assert(last.contains("hot"), "dominant key evicted")
    assert(last("hot")._2 === 1L, s"hot must rank first: $last")
    last.foreach { case (item, (lb, _)) =>
      val t = exact.getOrElse(item, 0L)
      assert(lb <= t && t - lb <= slack,
        s"$item: lb $lb vs exact $t, slack $slack")
    }
    // every cumulative heavy hitter above the guarantee survives
    exact.filter(_._2 > slack).keys
      .foreach(i => assert(last.contains(i), s"heavy $i missing"))
  }

  test("monitor fan-out: quality + top-k observe ONE source concurrently") {
    import graft.streaming.QualityMonitor
    val src = Files.createTempDirectory("fan_src_").toString
    val met1 = Files.createTempDirectory("fan_q_").toString
    val met2 = Files.createTempDirectory("fan_t_").toString
    val ck1 = Files.createTempDirectory("fan_c1_").toString
    val ck2 = Files.createTempDirectory("fan_c2_").toString
    (Seq.fill(40)("hot") ++ (0 until 20).map(i => s"u$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "v").coalesce(1).write.mode("append").parquet(src)
    // the T5 shape: two independent streaming queries over the same
    // source dir, each with its own checkpoint
    def stream = spark.readStream.schema("k string, v bigint").parquet(src)
    val q1 = QualityMonitor.start(stream,
      Seq(("v_nonneg", col("v") >= 0L), ("k_known", col("k") =!= "zzz")),
      met1, ck1)
    val q2 = TopKMonitor.start(stream, "k", 4, met2, ck2)
    try { q1.processAllAvailable(); q2.processAllAvailable() }
    finally { q1.stop(); q2.stop() }
    val quality = spark.read.parquet(met1)
    assert(quality.count() === 2, "two rules, one batch")
    assert(quality.agg(sum("n_violations")).head().getLong(0) === 0L)
    val topk = spark.read.parquet(met2).collect()
    assert(topk.nonEmpty)
    assert(topk.minBy(_.getAs[Long]("rank")).getAs[String]("item") === "hot")
  }
}
