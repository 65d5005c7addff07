package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.alerts._
import graft.serving.ServingTable

/** Offline archival surface: index tables, statistics, serving-table
  * point lookups, batched ingestion, locus cut, SQL function registry.
  */
class ArchiveSpec extends SparkTestBase {

  private lazy val science = {
    val enriched = graft.jobs.Nightly.enrich(AlertSchema.fixture(spark, 200))
    Tracklets.attach(enriched, Tracklets.detect(enriched))
  }

  test("index tables project and key correctly") {
    val tables = ArchiveIndex.all(science)
    // the reference's full set (bin/ztf/archive_index.py:47-300 +
    // archive_images.py)
    assert(tables.keySet === Set("objectId_jd", "pixel128_jd_objectId",
      "class_jd_objectId", "tracklet_objectId", "upper_objectId_jd",
      "uppervalid_objectId_jd", "ssnamenr_jd", "tns_jd_objectId",
      "cutouts_objectId_jd"))

    val oid = tables("objectId_jd")
    assert(oid.count() === science.count())
    assert(oid.columns.contains("row_key"))

    val pix = tables("pixel128_jd_objectId").collect()
    pix.foreach(r => assert(r.getAs[Long]("pixel") >= 0 &&
      r.getAs[Long]("pixel") < 12L * 128 * 128))

    val cls = tables("class_jd_objectId")
    val ids = cls.select("classification", "class_id").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ids.forall { case (k, v) => ArchiveIndex.classIds(k) == v })
  }

  test("cutouts index: file provenance resolves to the lake parquet path") {
    // the images job keys (objectId, jd) -> the parquet FILE holding the
    // cutouts (ref archive_images.py:51-60) — provenance only appears
    // when the frame actually comes from files
    val dir = java.nio.file.Files.createTempDirectory("graft_img_").toString
    science.write.mode("overwrite").parquet(dir)
    val fromLake = spark.read.parquet(dir)
    val idx = ArchiveIndex.imagesIndex(fromLake)
    assert(idx.columns.toSeq ===
      Seq("objectId", "jd", "candid", "hdfs_path", "row_key"))
    assert(idx.count() === science.count())
    val paths = idx.select("hdfs_path").distinct().collect().map(_.getString(0))
    assert(paths.nonEmpty && paths.forall(p =>
      p.contains(new java.io.File(dir).getName) && p.endsWith(".parquet")))
  }

  test("upper/uppervalid tables: null-edge explode-then-filter semantics") {
    val flagged = ArchiveIndex.withLastPrvStatus(science)
    // the two gates are disjoint and only fire when history exists
    assert(flagged.filter(col("upper") && col("uppervalid")).count() === 0)
    assert(flagged.filter(
      (col("upper") || col("uppervalid")) && size(col("prv_candidates")) === 0
    ).count() === 0)

    // upper: every exploded row is a non-detection; mag columns dropped
    val up = ArchiveIndex.upperLimits(science)
    assert(up.count() > 0, "fixture must contain upper-limit alerts")
    assert(!up.columns.contains("magpsf") && !up.columns.contains("sigmapsf"))
    assert(up.columns.contains("diffmaglim") && up.columns.contains("provenance"))
    assert(up.filter(col("diffmaglim").isNull).count() === 0)

    // uppervalid: every exploded row is a real-but-noisy measurement
    val uv = ArchiveIndex.upperValid(science)
    assert(uv.count() > 0, "fixture must contain noisy measurements")
    assert(uv.filter(col("magpsf").isNull).count() === 0)
    assert(!uv.columns.contains("rb") && !uv.columns.contains("nbad"))
    // uppervalid carries the reference-source columns per exploded row
    // (ref: archive_index.py:216-264); upper does not
    for (c <- Seq("magnr", "sigmagnr", "isdiffpos", "distnr")) {
      assert(uv.columns.contains(c), s"uppervalid missing $c")
      assert(!up.columns.contains(c), s"upper must drop $c")
    }

    // row keys pair objectId with the HISTORY jd, not the candidate jd
    // (compare per-alert: another alert's candidate jd may coincide with
    // a history jd on the fixture's regular time grid)
    val candJdByCandid = science
      .select(col("candid"), col("candidate.jd")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    up.select("candid", "jd").collect().foreach { r =>
      assert(r.getDouble(1) !== candJdByCandid(r.getLong(0)))
    }
  }

  test("ssnamenr and tns index tables filter to matched alerts only") {
    val sso = ArchiveIndex.ssnamenrIndex(science)
    assert(sso.count() === science.filter(col("roid") === 3).count())
    assert(sso.count() > 0, "fixture must contain SSO matches")
    sso.collect().foreach { r =>
      val key = r.getAs[String]("row_key")
      assert(key.startsWith(r.getAs[String]("ssnamenr") + "_"))
    }

    val tns = ArchiveIndex.tnsIndex(science)
    assert(tns.count() === science.filter(col("tns") =!= "").count())
    tns.collect().foreach(r => assert(r.getAs[String]("tns").nonEmpty))
  }

  test("nightly statistics summary row (A1-A4/A3/L1/S7)") {
    val summary = Statistics.nightlySummary(science).collect()(0)
    assert(summary.getAs[String]("schemavsn") === "3.3")
    assert(summary.getAs[Long]("n_alerts") === science.count())
    assert(summary.getAs[Long]("n_objects") ===
      science.select("objectId").distinct().count())
    val prv = science.agg(sum(size(coalesce(col("prv_candidates"), array()))))
      .collect()(0).getLong(0)
    assert(summary.getAs[Long]("n_prv_detections") === prv)
    val perClass = Statistics.classCounts(science).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perClass.values.sum === science.count())
  }

  test("withCached runs the body and unpersists (Y7)") {
    val df = science.select("candid")
    val n = Statistics.withCached(df)(d => d.count())
    assert(n === science.count())
    assert(df.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("serving table: salted write, point lookup prunes to one salt (S5)") {
    val dir = Files.createTempDirectory("graft_serve_").toString
    val flat = science.select(col("objectId"), col("candid"),
      col("classification"))
    ServingTable.write(flat, dir, Seq("objectId", "candid"), "candid")
    // schema row sidecar
    val schemaJson = ServingTable.readSchemaRow(spark, dir)
    assert(schemaJson.contains("objectId"))
    // point lookup
    val sample = flat.limit(1).collect()(0)
    val key = s"${sample.getString(0)}_${sample.getLong(1)}"
    val hit = ServingTable.lookup(spark, dir, key)
    assert(hit.count() === 1)
    assert(hit.collect()(0).getAs[String]("classification") === sample.getString(2))
    // partition pruning on the salt
    val plan = hit.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(__salt"), plan)
  }

  test("serving table lookup derives the salt from the DECLARED component") {
    // salt source is the FIRST key component — a trailing-component
    // assumption would compute the salt from jd and miss every key
    val dir = Files.createTempDirectory("graft_serve_salt_").toString
    val flat = science.select(
      col("candid"), col("candidate.jd").as("jd"), col("classification"))
    ServingTable.write(flat, dir, Seq("candid", "jd"), saltSource = "candid")
    val meta = ServingTable.readMeta(spark, dir)
    assert(meta.keyCols === Seq("candid", "jd"))
    assert(meta.saltSource === "candid" && meta.saltDigits === 2)
    assert(meta.schemaJson.contains("classification"))
    val sample = flat.limit(1).collect()(0)
    val key = s"${sample.getLong(0)}_${sample.getDouble(1)}"
    val hit = ServingTable.lookup(spark, dir, key)
    assert(hit.count() === 1)
    assert(hit.collect()(0).getAs[String]("classification") === sample.getString(2))
  }

  test("batched ingestion loops over bounded file groups (Y8)") {
    val dir = Files.createTempDirectory("graft_batches_").toString
    (0 until 5).foreach { i =>
      AlertSchema.fixture(spark, 10, seed = i.toLong)
        .select("objectId", "candid")
        .write.parquet(s"$dir/f$i")
    }
    val files = (0 until 5).map(i => s"$dir/f$i")
    var batches = 0
    var rows = 0L
    val n = ServingTable.ingestBatched(spark, files, batchSize = 2) { batch =>
      batches += 1
      rows += batch.count()
    }
    assert(n === 3 && batches === 3 && rows === 50L)
  }

  test("sso resolver: alias fan-out, decimal-first order, @k dedup, point lookup") {
    import spark.implicits._
    // per-object aggregation rows: native id + resolved name/number;
    // "Vesta" resolves twice (two native ids) to force the @k marking,
    // one object is unnumbered, one unresolved (null name)
    val agg = Seq(
      ("ZTF-a1", "Ceres", "1"),
      ("ZTF-a2", "Vesta", "4"),
      ("ZTF-a3", "Vesta", "4"),
      ("ZTF-b7", "2010 JO69", null),
      ("ZTF-c9", null, null)
    ).toDF("ssnamenr", "sso_name", "sso_number")
    val idx = graft.serving.Resolvers.ssoResolverIndex(agg)
    val rows = idx.collect()
    // 3 blocks: 5 names + 3 valid numbers + 5 natives = 13 alias rows
    assert(rows.length === 13)
    // every key is unique and lowercased with an @k suffix
    val keys = rows.map(_.getString(0))
    assert(keys.distinct.length === keys.length)
    keys.foreach(k => assert(k === k.toLowerCase && k.contains("@"), k))
    // duplicate resolution: Vesta appears once per native id, @0 then @1
    assert(keys.count(_.startsWith("vesta@")) === 2)
    assert(keys.contains("vesta@0") && keys.contains("vesta@1"))
    // unresolved name falls back to the native id (reference None-fill)
    assert(keys.contains("ztf-c9@0"))
    // decimal keys order numerically before non-decimal keys
    val firstRaw = rows.map(_.getString(0)).map(_.split("@")(0))
    val decPrefix = firstRaw.takeWhile(_.matches("[0-9]+"))
    assert(decPrefix.nonEmpty, "numeric keys must lead the index")
    assert(decPrefix.map(_.toLong).toSeq === decPrefix.map(_.toLong).sorted.toSeq)
    assert(firstRaw.drop(decPrefix.length).forall(!_.matches("[0-9]+")))
    // serving-table round trip: a point lookup on an alias resolves
    // back to the native designation
    val dir = Files.createTempDirectory("sso-resolver").toString
    graft.serving.Resolvers.writeSsoResolver(idx, dir)
    val hit = ServingTable.lookup(spark, dir, "vesta@0").collect()
    assert(hit.length === 1 && hit(0).getAs[String]("ssnamenr") === "ZTF-a2")
    val byNum = ServingTable.lookup(spark, dir, "4@0").collect()
    assert(byNum.length === 1 && byNum(0).getAs[String]("name") === "Vesta")
  }

  test("sso resolver: >18-digit keys sort lexically instead of overflowing") {
    import spark.implicits._
    // an all-digit key longer than long range must not throw under ANSI
    // mode — it falls into the lexical class (the pandas reference's
    // arbitrary-precision sort differs only for keys that cannot occur)
    val agg = Seq(
      ("ZTF-h1", "99999999999999999999", null), // 20 digits > Long.Max
      ("ZTF-h2", "7", null)
    ).toDF("ssnamenr", "sso_name", "sso_number")
    val raw = graft.serving.Resolvers.ssoResolverIndex(agg)
      .collect().map(_.getString(0).split("@")(0))
    // the short numeric key leads; the oversized one lands with the
    // lexical block (after numerics), and nothing threw
    assert(raw.head === "7")
    assert(raw.contains("99999999999999999999"))
  }

  test("sso resolver: case-colliding aliases share one @k sequence") {
    import spark.implicits._
    // aliases differing only in case lowercase onto the same serving
    // key — the @k marking must treat them as one duplicate group
    val agg = Seq(
      ("ZTF-x1", "2010 AB", null),
      ("ZTF-x2", "2010 ab", null)
    ).toDF("ssnamenr", "sso_name", "sso_number")
    val keys = graft.serving.Resolvers.ssoResolverIndex(agg)
      .collect().map(_.getString(0))
    assert(keys.distinct.length === keys.length,
      s"serving keys collide: ${keys.mkString(", ")}")
    assert(keys.count(_.startsWith("2010 ab@")) === 2)
  }

  test("tns resolver: concatenated lowercase key, point lookup") {
    import spark.implicits._
    val cat = Seq(
      ("SN 2024abc", "2024abc", "SN Ia"),
      ("AT 2024xyz", "2024xyz", null)
    ).toDF("fullname", "internal_name", "type")
    val idx = graft.serving.Resolvers.tnsResolverIndex(
      cat, Seq("fullname", "internal_name"))
    val keys = idx.select("tns_key").as[String].collect().toSet
    assert(keys === Set("sn 2024abc_2024abc", "at 2024xyz_2024xyz"))
    val dir = Files.createTempDirectory("tns-resolver").toString
    graft.serving.Resolvers.writeTnsResolver(idx, dir,
      Seq("fullname", "internal_name"))
    val hit = ServingTable.lookup(spark, dir, "sn 2024abc_2024abc").collect()
    assert(hit.length === 1 && hit(0).getAs[String]("type") === "SN Ia")
  }

  test("SQL-string filter form equals the Column form (F3)") {
    val alerts = AlertSchema.fixture(spark, 200)
    val viaString = alerts
      .filter("candidate.nbad = 0 and candidate.rb >= 0.55 and candidate.fid != 3")
      .count()
    assert(viaString === AlertFunctions.qualityCuts(alerts).count())
  }

  test("locus cut keeps points above the log-distance line (F2)") {
    import spark.implicits._
    val df = Seq(
      (1.0, 1.0), // log10(1)=0; 1.0 > 0.2 → keep
      (10.0, 1.0), // log10(10)=1; 1.0 < 1.2 → drop
      (100.0, 2.5) // 2.5 > 2.2 → keep
    ).toDF("distnr", "magdiff")
    val kept = df.filter(
      AlertFunctions.locusCut(col("distnr"), col("magdiff"))).collect()
    assert(kept.map(_.getDouble(0)).toSet === Set(1.0, 100.0))
  }

  test("SQL function registry exposes the graft expressions") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val pix = spark.sql(
      "SELECT graft_ang2pix(10.0d, 20.0d, 256) AS p").collect()(0).getLong(0)
    assert(pix === Healpix.ang2pixNest(256, 10.0, 20.0))
    val sim = spark.sql(
      "SELECT graft_simhash(array('a','b')) AS s, " +
        "graft_minhash(array('a b c'), 4) AS m, " +
        "graft_word_ngrams(array('a','b','c'), 2) AS g, " +
        "graft_sorted_intersect_size(array('a','b'), array('b','c')) AS i")
      .collect()(0)
    assert(sim.getSeq[Long](1).length === 4)
    assert(sim.getSeq[String](2) === Seq("a b", "b c"))
    assert(sim.getInt(3) === 1)
    val avro = spark.sql(
      """SELECT graft_from_avro(
        |  graft_to_avro(named_struct('x', 5L)),
        |  '{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}'
        |).x AS x""".stripMargin).collect()(0).getLong(0)
    assert(avro === 5L)
    // the round-6/7 kernels are SQL-callable too
    val more = spark.sql(
      "SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c, " +
        "graft_ngram_md5(array('a','b','c'), 2) AS nm, " +
        "graft_ngram_join(array('a','b','c'), 2) AS nj, " +
        "graft_simhash_md5(array('a','b')) AS sm, " +
        "graft_lang_id(array('the','and','of','to','in')) AS l, " +
        "graft_sorted_long_intersect_size(array(1L,2L), array(2L,3L)) AS li, " +
        "length(graft_nfc('Cafe\u0301')) AS nfc")
      .collect()(0)
    assert(more.getDouble(0) === 1.0)
    assert(more.getSeq[String](1).length === 2 &&
      more.getSeq[String](1).forall(_.length == 32))
    assert(more.getSeq[String](2) === Seq("a b", "b c"))
    assert(more.getAs[String]("l") === "en")
    assert(more.getInt(5) === 1)
    assert(more.getInt(6) === 4) // e+combining acute composed away
    // wrong arity surfaces as WRONG_NUM_ARGS, not IndexOutOfBounds
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(array(1.0f))").collect()
    }
    assert(e.getMessage.contains("graft_cosine") &&
      e.getMessage.contains("2"), e.getMessage)
    // the typed-Aggregator sketches are SQL-callable too; skewed
    // stream: 'hot' (600 rows) vs 400 singletons
    val agg = spark.sql(
      "SELECT graft_kmv64(md5(k)) AS sk, graft_heavy_hitters16(k) AS hh " +
        "FROM (SELECT CASE WHEN id < 600 THEN 'hot' " +
        "ELSE CAST(id AS STRING) END AS k FROM range(1000))")
      .collect()(0)
    assert(agg.getSeq[String](0).length === 64) // 401 distinct, k=64 kept
    val hh = agg.getSeq[org.apache.spark.sql.Row](1)
    assert(hh.nonEmpty && hh.length <= 16)
    assert(hh.head.getString(0) === "hot")
    assert(hh.head.getLong(1) >= 600 - 1000 / 17) // MG deficit bound
  }
}
