package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.alerts.AlertSchema
import graft.jobs.{Nightly, Reports}

/** Report-job layer (jobs/Reports.scala) on the enriched alert frame:
  * each of the four reference shapes runs end-to-end and its defining
  * invariants hold (threshold respected, one row per object, top-N
  * bound, anti-join removed sent objects, exports land on disk).
  */
class ReportsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val science =
    Nightly.enrich(AlertSchema.fixture(spark, 200, nObjects = 40)).cache()

  test("slsn: threshold + idxmax-per-object, one row per objectId") {
    val out = Reports.slsn(threshold = 0.0).run(science)
    val rows = out.collect()
    assert(rows.nonEmpty, "slsn report empty at threshold 0")
    val ids = rows.map(_.getAs[String]("objectId"))
    assert(ids.distinct.length === ids.length, "objectId not unique")
    // the kept row carries the per-object max ndethist
    val maxN = science.groupBy("objectId")
      .agg(max(col("candidate.ndethist")).as("mx"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Int]("ndethist") === maxN(r.getAs[String]("objectId")))
    }
    // tighter threshold only shrinks the report
    val strict = Reports.slsn(threshold = 0.9).run(science).count()
    assert(strict <= rows.length)
  }

  test("hostless: range + size cuts hold, global count attached to every row") {
    val shape = Reports.hostless(
      statCol = col("anomaly_score"), lo = 0.0, hi = 10.0,
      detCount = col("nalerthist"), maxDetections = 10)
    val rows = shape.run(science).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n_processed") === n,
        "n_processed must equal the report cardinality on every row")
      val st = r.getAs[Double]("stat")
      assert(st >= 0.0 && st <= 10.0)
    }
  }

  test("anomaly: top-N by score, stamps dropped, row key synthesized") {
    val out = Reports.anomaly(topN = 5).run(science)
    assert(out.count() === 5)
    assert(!out.columns.contains("cutoutScience"))
    assert(out.columns.contains("jd_objectId"))
    // the 5 kept are the global top-5 anomaly scores
    val kept = out.select("anomaly_score").as[Double].collect().sorted
    val top5 = science.select("anomaly_score").as[Double]
      .collect().sorted.reverse.take(5).sorted
    assert(kept.zip(top5).forall { case (a, b) => a === b })
    out.select("jd_objectId").as[String].collect()
      .foreach(k => assert(k.contains("_ZTF"), s"bad row key $k"))
  }

  test("tns: min-per-object discovery row, sent objects anti-joined away") {
    val past = science.select("objectId").distinct().limit(3).cache()
    val pastIds = past.as[String].collect().toSet
    val out = Reports.tnsPush(past, scoreThreshold = 0.0, maxNdethist = 20)
      .run(science)
    val rows = out.collect()
    val ids = rows.map(_.getAs[String]("objectId"))
    assert(ids.distinct.length === ids.length)
    assert(ids.forall(!pastIds.contains(_)), "already-sent object leaked")
    // discovery row = per-object min candid among passing alerts
    val minC = science
      .filter(col("rf_snia_vs_nonia") >= 0.0 && col("candidate.ndethist") <= 20)
      .groupBy("objectId").agg(min("candid").as("mn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("candid") === minC(r.getAs[String]("objectId")))
    }
  }

  test("report filters push to the parquet scan, below the window") {
    // the slsn shape's candidate gate must reach the scan: the keyed
    // shuffle sees candidates only, never the lake
    val df = graft.SparkEntry.queries("q64_report_slsn")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(value,150.0)"),
      s"value>=150 not pushed to scan:\n$plan")
  }

  test("anomaly/tns shapes: the id sets broadcast — the lake side never shuffles for them") {
    for ((q, joinType) <- Seq(
        "q66_report_anomaly" -> "LeftSemi",
        "q67_report_tns" -> "LeftAnti")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect() // AQE: read the final adaptive plan
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastHashJoin") && plan.contains(joinType),
        s"$q should $joinType against a broadcast id set:\n$plan")
    }
  }

  test("sso shape: trajectory reduces before the join, names sanitized") {
    val df = graft.SparkEntry.queries("q69_report_sso")(
      spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq === Seq(
      "sso_cand_id", "orbital_a", "orbital_class",
      "n_points", "arc_first", "arc_last", "row_key"))
    // aggregate sits below the join: the join input is per-object rows
    val analyzed = df.queryExecution.optimizedPlan.toString()
    val aggIdx = analyzed.indexOf("Aggregate")
    val joinIdx = analyzed.indexOf("Join")
    assert(aggIdx > joinIdx && joinIdx >= 0,
      s"trajectory aggregate must be a join INPUT:\n$analyzed")
    val rows = df.limit(5).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("row_key") ===
        s"${r.getAs[Long]("sso_cand_id")}_${r.getAs[Long]("n_points")}")
    }
  }

  test("exports: CSV file and serving table land on disk and read back") {
    val report = Reports.slsn(threshold = 0.0).run(science)
    val csvDir = Files.createTempDirectory("report-csv").toString
    Reports.exportCsv(report, csvDir)
    val back = spark.read.option("header", "true").csv(csvDir)
    assert(back.count() === report.count())

    val servDir = Files.createTempDirectory("report-serv").toString
    Reports.exportServing(report, servDir,
      keyCols = Seq("objectId", "jd"), saltSource = "objectId")
    val one = report.select("objectId", "jd").first()
    val hit = graft.serving.ServingTable.lookup(
      spark, servDir, s"${one.getString(0)}_${one.getDouble(1)}")
    assert(hit.count() === 1)
  }
}
