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

  test("dwarf-agn: asteroids removed, only catalog associations survive") {
    // catalog planted at the first alerts' positions so matches exist
    val cat = science
      .select(col("objectId"), col("candidate.ra").as("cat_ra"),
        col("candidate.dec").as("cat_dec"))
      .limit(8)
      .withColumn("cat_name", concat(lit("MaNGA-"), col("objectId")))
      .select("cat_name", "cat_ra", "cat_dec")
    val out = Reports.dwarfAgn(cat, radiusArcsec = 5.0).run(science)
    val rows = out.collect()
    assert(rows.nonEmpty, "planted catalog produced no associations")
    rows.foreach(r =>
      assert(r.getAs[String]("manga").startsWith("MaNGA-")))
    // asteroid rows (roid == 3) never reach the crossmatch
    val asteroidIds = science.filter(col("roid") === 3)
      .select("candid").as[Long].collect().toSet
    rows.foreach(r => assert(!asteroidIds.contains(r.getAs[Long]("candid"))))
  }

  test("early-tde: score/age/counterpart gates hold, ranked by score") {
    val out = Reports.earlyTde(scoreThreshold = 0.0, maxAgeDays = 1e9)
      .run(science).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("tde_score") >= 0.0)
    }
    val scores = out.map(_.getAs[Double]("tde_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "report must rank by tde_score descending")
    // every survivor has no catalog counterpart
    val unknownIds = science.filter(col("cdsxmatch") === "Unknown")
      .select("candid").as[Long].collect().toSet
    out.foreach(r => assert(unknownIds.contains(r.getAs[Long]("candid"))))
  }

  test("blazar states: map extraction + two branches, row key stamped") {
    // blazar_stats arrives from an upstream science module; plant a
    // deterministic map so both branches are populated
    val withStats = science.withColumn("blazar_stats", map(
      lit("instantness_low"), (col("candid") % 10).cast("double"),
      lit("robustness_low"), (col("candid") % 7).cast("double"),
      lit("instantness_high"), (col("candid") % 5).cast("double"),
      lit("robustness_high"), (col("candid") % 3).cast("double")))
    val out = Reports.blazarStates(lowMax = 2.0, highMin = 2.0)
      .run(withStats).collect()
    assert(out.nonEmpty)
    val states = out.map(_.getAs[String]("state")).toSet
    assert(states === Set("low", "high"), s"both branches must fire: $states")
    out.foreach { r =>
      if (r.getAs[String]("state") == "low") {
        assert(r.getAs[Double]("instantness_low") <= 2.0 &&
          r.getAs[Double]("robustness_low") <= 2.0)
      } else {
        assert(r.getAs[Double]("instantness_high") >= 2.0 &&
          r.getAs[Double]("robustness_high") >= 2.0)
      }
      assert(r.getAs[String]("jd_objectId").contains("_ZTF"))
    }
  }

  test("symbiotic/cv: label split + per-category thresholds route channels") {
    val cat = science
      .select(col("objectId"), col("candidate.ra").as("cat_ra"),
        col("candidate.dec").as("cat_dec"))
      .limit(20)
      .withColumn("cat_name",
        concat(lit("V"), col("objectId"),
          when(length(col("objectId")) % 2 === 0, lit(",symbiotic_stars"))
            .otherwise(lit(",cataclysmic_variables"))))
      .select("cat_name", "cat_ra", "cat_dec")
    // Δt chosen so dmag = mag_rate × Δt crosses both thresholds
    val out = Reports.symbioticCv(cat, deltaTime = lit(5.0),
      radiusArcsec = 5.0).run(science).collect()
    out.foreach { r =>
      val (catg, dmag, ch) = (r.getAs[String]("cat"),
        r.getAs[Double]("dmag"), r.getAs[String]("channel"))
      assert(dmag <= -0.5)
      assert(!r.getAs[String]("name").contains(","), "name must be split")
      if (catg == "symbiotic_stars") assert(ch === "@fink_symbiotic_stars")
      else {
        assert(catg === "cataclysmic_variables" && ch === "@fink_cv_stars")
        assert(dmag <= -3.0, "CVs carry the stricter cut")
      }
    }
  }

  test("vast: distance/dec footprint + confirmed-or-candidate OR filter") {
    // the 200-alert fixture has no in-radius mangrove galaxy (1-arcmin
    // cones over a random sky are almost always empty) — plant the map
    // so matched/unmatched and near/far cases all occur
    val withMangrove = science.withColumn("mangrove", map(
      lit("lum_dist"),
      when(col("candid") % 3 === 0,
        (col("candid") % 500).cast("string"))
        .otherwise(lit(null).cast("string"))))
    val out = Reports.vast(maxLumDist = 400.0, maxDec = 90.0,
      snThreshold = 0.0).run(withMangrove).collect()
    assert(out.nonEmpty)
    // survivors = exactly the rows with a counterpart inside 400 Mpc
    val expected = withMangrove
      .filter(element_at(col("mangrove"), "lum_dist").cast("float") <= 400.0f)
      .count()
    assert(out.length.toLong === expected,
      s"got ${out.length}, expected $expected")
  }

  test("al loop: budget caps, boundary ranking ascending, high-prob branch") {
    val hosts = science.select("cdsxmatch").distinct().as[String].collect()
    val out = Reports.iaActiveLearning(hosts.toSeq, budget = 5)
      .run(science).collect()
    val byBranch = out.groupBy(_.getAs[String]("branch"))
    assert(byBranch.keySet.subsetOf(Set("queried", "highprob")))
    byBranch.values.foreach(rows => assert(rows.length <= 5))
    val queried = byBranch.getOrElse("queried", Array.empty)
    assert(queried.nonEmpty, "queried branch empty")
    val dists = queried.map(_.getAs[Double]("dist_center"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
      "queried branch must rank by boundary distance ascending")
    byBranch.getOrElse("highprob", Array.empty).foreach { r =>
      assert(r.getAs[Double]("al_snia_vs_nonia") > 0.5 &&
        r.getAs[Double]("age_days") <= 10.0)
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
