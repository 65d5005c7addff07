package graft

import org.apache.spark.sql.functions._

import graft.alerts.{AlertSchema, Crossmatch}
import graft.enrich.ScienceModules

/** Reference-arity enrichment: ~20 science columns from 11 history
  * arrays + 3 crossmatch stages + 9 scorers, still a zero-exchange plan;
  * the expression crossmatch must agree with the join-based
  * [[Crossmatch.nearestLabel]] on planted positions.
  */
class ScienceModulesSpec extends SparkTestBase {

  private lazy val enriched = ScienceModules(AlertSchema.fixture(spark, 200))

  test("pipeline emits every reference-shaped output column") {
    val cols = enriched.columns.toSet
    for (c <- ScienceModules.outputColumns)
      assert(cols.contains(c), s"missing $c")
    // temporaries are dropped like the reference (expanded + ft_module)
    for (c <- ScienceModules.historyFields.map("c" + _) ++
        Seq("ft_module", "lc_features", "faint", "stationary"))
      assert(!cols.contains(c), s"temporary $c leaked")
  }

  test("enrichment stays a zero-exchange plan at full arity") {
    val plan = enriched.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"enrichment must not shuffle:\n$plan")
  }

  test("expression crossmatch labels planted positions like the join form") {
    import spark.implicits._
    val catalog = Seq(
      ("RRLyr", 10.0, 10.0),
      ("QSO", 200.0, -45.0),
      ("Star", 10.0005, 10.0005) // ~2.3 arcsec from the first entry
    ).toDF("cat_name", "cat_ra", "cat_dec")
    val probes = Seq(
      (1L, 10.0, 10.0),      // exact hit → RRLyr (nearer than Star)
      (2L, 200.0001, -45.0), // ~0.25 arcsec → QSO
      (3L, 100.0, 50.0)      // nothing near → Unknown
    ).toDF("id", "ra", "dec")
    val viaExpr = probes.withColumn("label",
      Crossmatch.nearestLabelExpr(col("ra"), col("dec"), catalog, 1.5 / 3600.0))
      .select("id", "label").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaExpr === Map(1L -> "RRLyr", 2L -> "QSO", 3L -> "Unknown"))
    val viaJoin = Crossmatch.nearestLabel(
      probes, col("ra"), col("dec"), col("id"), catalog, 1.5 / 3600.0, "label")
      .select("id", "label").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaJoin === viaExpr)
  }

  test("roid levels follow the reference gating") {
    val byLevel = enriched
      .groupBy("roid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // known-SSO alerts (ssdistnr in [0,5)) must be flagged 3
    val sso = enriched.filter(
      col("candidate.ssdistnr") >= 0 && col("candidate.ssdistnr") < 5)
    assert(sso.filter(col("roid") =!= 3).count() === 0)
    assert(byLevel.getOrElse(3, 0L) === sso.count())
    assert(byLevel.keySet.subsetOf(Set(0, 1, 2, 3)))
    // asteroid-flagged alerts are excluded from is_transient (ref gate)
    assert(enriched.filter(col("roid") === 3 && col("is_transient")).count() === 0)
  }

  test("per-band features split by fid and count the right detections") {
    val rows = enriched
      .select(col("lc_features_g.n"), col("lc_features_r.n"), col("nalerthist"))
      .collect()
    // per alert: n_g + n_r <= nalerthist (fid-3 detections belong to no band)
    rows.foreach(r => assert(r.getLong(0) + r.getLong(1) <= r.getLong(2)))
    // and the bands are not all empty across the batch
    assert(rows.map(_.getLong(0)).sum > 0)
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("fast-transient expansion yields flat columns, not the struct") {
    for (c <- ScienceModules.FastTransient.outputFields)
      assert(enriched.columns.contains(c), s"missing expanded $c")
    assert(!enriched.columns.contains("ft_module"))
  }

  test("scores and gates are never NULL despite upper-limit history") {
    // the fixture plants NULL-magpsf upper limits in ~30% of history
    // entries; every fold must mask them (ADVICE r3: an unmasked
    // acc+NULL nulls rf_snia_vs_nonia and cascades into classification)
    for (c <- Seq("rf_snia_vs_nonia", "snn_snia_vs_nonia", "mulens",
        "rf_kn_vs_nonkn", "mag_rate", "anomaly_score", "slsn_score",
        "is_transient", "classification"))
      assert(enriched.filter(col(c).isNull).count() === 0, s"$c has NULLs")
    // and specifically on alerts that DO carry an upper limit in history
    val upperAlerts = enriched.filter(
      size(filter(col("prv_candidates"),
        x => x.getField("magpsf").isNull)) > 0)
    assert(upperAlerts.count() > 0, "fixture lost its upper limits")
    assert(upperAlerts.filter(col("rf_snia_vs_nonia").isNull).count() === 0)
  }

  test("mangrove is map<string,string> with the reference key set on every row") {
    import org.apache.spark.sql.types.{MapType, StringType}
    assert(enriched.schema("mangrove").dataType ===
      MapType(StringType, StringType, valueContainsNull = true))
    // stable schema: matched or not, every row carries the full key set
    // in catalog column order (the reference's None-valued dict shape)
    val keyRows = enriched
      .select(map_keys(col("mangrove")).as("k")).distinct().collect()
    assert(keyRows.length === 1)
    assert(keyRows.head.getSeq[String](0) === ScienceModules.mangroveKeys)
  }

  test("property-map crossmatch attaches the nearest row's props") {
    import spark.implicits._
    val catalog = Seq(
      ("PGC1", "100.0", 10.0, 10.0),
      ("PGC2", "250.0", 200.0, -45.0),
      ("PGC3", "17.5", 10.003, 10.003) // ~15 arcsec from PGC1
    ).toDF("HyperLEDA_name", "lum_dist", "cat_ra", "cat_dec")
    val probes = Seq(
      (1L, 10.0, 10.0),     // nearest = PGC1
      (2L, 10.0029, 10.003), // nearest = PGC3
      (3L, 100.0, 50.0)     // unmatched → all-null-valued map
    ).toDF("id", "ra", "dec")
    val got = probes.withColumn("m",
      Crossmatch.nearestPropsExpr(col("ra"), col("dec"), catalog,
        60.0 / 3600.0, Seq("HyperLEDA_name", "lum_dist")))
      .select(col("id"), col("m").getItem("HyperLEDA_name"),
        col("m").getItem("lum_dist"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L) === (("PGC1", "100.0")))
    assert(got(2L) === (("PGC3", "17.5")))
    assert(got(3L) === ((null, null)))

    // null coordinates (position-less alert) must yield the stable
    // all-null-valued map, not a null column or an exception
    val nullPos = probes.select(col("id"),
        when(col("id") === 1L, col("ra")).as("ra"),
        when(col("id") === 1L, col("dec")).as("dec"))
      .withColumn("m", Crossmatch.nearestPropsExpr(
        col("ra"), col("dec"), catalog, 60.0 / 3600.0,
        Seq("HyperLEDA_name", "lum_dist")))
    assert(nullPos.filter(col("m").isNull).count() === 0)
    val nm = nullPos.filter(col("id") === 3L)
      .select(map_keys(col("m")), col("m").getItem("HyperLEDA_name"))
      .collect()(0)
    assert(nm.getSeq[String](0) === Seq("HyperLEDA_name", "lum_dist"))
    assert(nm.isNullAt(1))
  }

  test("t2 is map<string,float> over a stable vocabulary, a probability simplex") {
    import org.apache.spark.sql.types.{FloatType, MapType, StringType}
    assert(enriched.schema("t2").dataType ===
      MapType(StringType, FloatType, valueContainsNull = true))
    val rows = enriched.select(
      map_keys(col("t2")),
      aggregate(map_values(col("t2")), lit(0.0), (a, x) => a + x)).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === ScienceModules.T2Score.classes)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-5, s"t2 scores must sum to 1: $r")
    }
  }

  test("from_upper flags that the latest history entry was an upper limit") {
    val rows = enriched.select(
      col("from_upper"),
      size(col("prv_candidates")) > 0 &&
        element_at(col("prv_candidates"), -1).getField("magpsf").isNull)
      .collect()
    rows.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
    assert(rows.exists(_.getBoolean(0)), "fixture has no from_upper=true case")
    assert(rows.exists(!_.getBoolean(0)))
  }
}
