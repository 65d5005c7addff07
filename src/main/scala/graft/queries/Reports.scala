package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t

/** The four reporting-job shapes (see [[graft.jobs.Reports]]) as
  * oracle-checked queries over the driver tables — the reference's
  * per-science-case batch reports re-expressed as filter + one
  * window/agg on the object key:
  *
  *   q64 slsn     — threshold filter → idxmax-per-object
  *                  (ref: bin/ztf/archive_slsn_candidates.py:235-259)
  *   q65 hostless — statistic range + valid-size cuts → global
  *                  processed-count attach
  *                  (ref: bin/ztf/archive_hostless.py:126-133)
  *   q66 anomaly  — per-model top-N → isin/semi-join back → row key
  *                  (ref: bin/ztf/archive_anomaly.py:95-130)
  *   q67 tns      — early filter → min-per-object → anti-join sent set
  *                  (ref: bin/ztf/push_to_tns.py:79-96)
  *   q69 sso      — orbital table ⋈ per-object trajectory reduction,
  *                  sanitized names + serving row key
  *                  (ref: bin/ztf/archive_sso_cand.py:55-96)
  *   q76 known-tde — lake filter → broadcast join vs small known-object
  *                  list → per-object last-seen reduction → formatted
  *                  notification string
  *                  (ref: bin/ztf/archive_known_tde.py:55-75)
  *   q77 nightly statistics — one wide stats row per night: totals,
  *                  distincts, per-band conditional counts
  *                  (ref: bin/ztf/archive_statistics.py:87-133)
  *   q83 symbiotic/CV — "name,cat" label split → two category branches
  *                  at different thresholds → channel-tagged union
  *                  (ref: bin/ztf/archive_symbiotic_and_cv_stars.py)
  *   q84 blazar states — map-column stat extraction → low/high state
  *                  branches → state-tagged union + serving row key
  *                  (ref: bin/ztf/archive_extreme_states_blazar.py)
  *   q85 AL loop   — |p−0.5| boundary ranking + high-prob ranking, both
  *                  budget-capped, branch-tagged union
  *                  (ref: bin/ztf/archive_ia_active_learning.py:146-196)
  *
  * Scale notes: every shape filters FIRST (pushed to the scan), then
  * reduces per object — the keyed shuffle sees only candidates, never
  * the lake. q65's global count is a one-row broadcast cross-join (the
  * scalar-attach idiom); q66's id set is limit-N and broadcast-semi-
  * joined (the distributed form of the reference's collect-then-isin);
  * q67's sent set is broadcast anti-joined. Nothing collects.
  */
object Reports extends QueryPack {

  def defs: Seq[QueryDef] = Seq(
    // ---- slsn shape: score threshold → per-object max-"ndethist" row.
    // The window runs over post-filter candidates only; event_id is
    // unique so the row_number is deterministic without a tie column.
    QueryDef(
      "q64_report_slsn",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
        t(s, d, "events")
          .filter(col("value") >= 150.0)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select("user_id", "event_id", "event_type", "value")
      },
      Some("""
        SELECT user_id, event_id, event_type, value FROM (
          SELECT user_id, event_id, event_type, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY event_id DESC) AS rk
          FROM events WHERE value >= 150.0)
        WHERE rk = 1""")),

    // ---- hostless shape: element-range cuts on an array statistic,
    // valid-element size cut, and the night's global processed count
    // attached to every surviving row (one-row broadcast cross-join).
    // All compared values are raw column bits (float→double widening is
    // exact) — no float arithmetic crosses the oracle.
    QueryDef(
      "q65_report_hostless",
      (s, d) => {
        val filt = t(s, d, "embeddings")
          .withColumn("e1", element_at(col("embedding"), 1).cast("double"))
          .withColumn("e2", element_at(col("embedding"), 2).cast("double"))
          .withColumn("n_pos",
            size(filter(col("embedding"), x => x > 0)).cast("long"))
          .filter(col("e1") >= 0.0 && col("e1") <= 0.1 &&
            col("e2") >= -0.15 && col("e2") <= 0.15 &&
            col("n_pos") <= 36)
        val nProcessed = filt.agg(count(lit(1)).as("n_processed"))
        filt.crossJoin(broadcast(nProcessed))
          .select("vec_id", "label", "e1", "e2", "n_pos", "n_processed")
      },
      Some("""
        WITH filt AS (
          SELECT vec_id, label,
            CAST(embedding[1] AS DOUBLE) AS e1,
            CAST(embedding[2] AS DOUBLE) AS e2,
            len(list_filter(embedding, x -> x > 0)) AS n_pos
          FROM embeddings
          WHERE CAST(embedding[1] AS DOUBLE) BETWEEN 0.0 AND 0.1
            AND CAST(embedding[2] AS DOUBLE) BETWEEN -0.15 AND 0.15
            AND len(list_filter(embedding, x -> x > 0)) <= 36)
        SELECT vec_id, label, e1, e2, n_pos,
          (SELECT COUNT(*) FROM filt) AS n_processed
        FROM filt""")),

    // ---- anomaly shape: per-model top-N most anomalous → id set →
    // semi-join the full frame (the reference's collect+isin, without
    // the driver round-trip) → serving row key.
    QueryDef(
      "q66_report_anomaly",
      (s, d) => {
        val ev = t(s, d, "events")
        val w = Window.partitionBy("event_type")
          .orderBy(col("value").desc, col("event_id"))
        val ids = ev
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select("event_id")
        ev.join(broadcast(ids), Seq("event_id"), "left_semi")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"),
            concat_ws("_", col("event_id").cast("string"),
              col("user_id").cast("string")).as("row_key"))
      },
      Some("""
        WITH ids AS (
          SELECT event_id FROM (
            SELECT event_id,
              row_number() OVER (PARTITION BY event_type
                ORDER BY value DESC, event_id) AS rk
            FROM events)
          WHERE rk <= 10)
        SELECT e.event_id, e.user_id, e.event_type, e.value,
          CAST(e.event_id AS VARCHAR) || '_' || CAST(e.user_id AS VARCHAR)
            AS row_key
        FROM events e
        WHERE e.event_id IN (SELECT event_id FROM ids)""")),

    // ---- tns shape: early-candidate filter → min-per-object (the
    // discovery row) → anti-join the already-reported object set.
    QueryDef(
      "q67_report_tns",
      (s, d) => {
        val ev = t(s, d, "events")
        val past = ev.select("user_id").distinct()
          .filter(col("user_id") % 7 === 0)
        ev.filter(col("event_type") === "signup" && col("value") <= 20.0)
          .groupBy("user_id")
          .agg(
            min(col("event_id")).as("first_event"),
            min(col("value")).as("min_value"),
            count(lit(1)).as("n_alerts"))
          .join(broadcast(past), Seq("user_id"), "left_anti")
      },
      Some("""
        SELECT user_id,
          min(event_id) AS first_event,
          min(value) AS min_value,
          COUNT(*) AS n_alerts
        FROM events
        WHERE event_type = 'signup' AND value <= 20.0
          AND user_id NOT IN (
            SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0)
        GROUP BY user_id""")),

    // ---- sso-candidate shape: the reference's two-table export job —
    // an "orbital parameters" table (one row per candidate object)
    // joined to the per-object reduction of its "trajectory" table,
    // column names sanitized on the way (the reference rewrites
    // '. '-contaminated fink-fat names), plus the serving row key
    // (ref: bin/ztf/archive_sso_cand.py:55-96). Orders plays the
    // orbital table, lineitem the trajectory points; the trajectory
    // side reduces BEFORE the join so the shuffle carries one row per
    // object, not per point.
    QueryDef(
      "q69_report_sso",
      (s, d) => {
        val traj = t(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("sso_cand_id"))
          .agg(
            count(lit(1)).as("n_points"),
            min(col("l_shipdate")).as("arc_first"),
            max(col("l_shipdate")).as("arc_last"))
        t(s, d, "orders")
          .select(
            col("o_orderkey").as("sso_cand_id"),
            col("o_totalprice").as("orbital_a"),
            col("o_orderpriority").as("orbital_class"))
          .join(traj, Seq("sso_cand_id"))
          .withColumn("row_key",
            concat_ws("_", col("sso_cand_id").cast("string"),
              col("n_points").cast("string")))
      },
      Some("""
        WITH traj AS (
          SELECT l_orderkey AS sso_cand_id,
            COUNT(*) AS n_points,
            MIN(l_shipdate) AS arc_first,
            MAX(l_shipdate) AS arc_last
          FROM lineitem GROUP BY l_orderkey)
        SELECT o.o_orderkey AS sso_cand_id,
          o.o_totalprice AS orbital_a,
          o.o_orderpriority AS orbital_class,
          t.n_points, t.arc_first, t.arc_last,
          CAST(o.o_orderkey AS VARCHAR) || '_' ||
            CAST(t.n_points AS VARCHAR) AS row_key
        FROM orders o JOIN traj t ON o.o_orderkey = t.sso_cand_id""")),

    // ---- ELAsTICC distribution shape end to end on driver data:
    // score columns → classifications array pack → broker metadata
    // (MJD→epoch-millis) → per-class explode + topic stamp
    // ([[graft.alerts.ElasticcSchema]]; ref bin/elasticc/
    // distribute_elasticc.py:57-160). Oracle-exact by construction:
    // scores are DYADIC rationals (k/256 etc.), so float casts and the
    // 1−p complements are bit-identical cross-engine, and midPointTai
    // uses k/128 so the millis product is an exact integer (truncating
    // vs rounding long casts agree). ----
    QueryDef(
      "q71_elasticc_route",
      (s, d) => {
        val ev = t(s, d, "events").select(
          col("event_id").as("alertId"),
          struct(
            (col("event_id") + 1000000L).as("diaSourceId"),
            (lit(60000.0) + (col("event_id") % 128).cast("double") / 128.0)
              .as("midPointTai"),
            lit(0.0).as("ra"), lit(0.0).as("decl"),
            lit(0.0f).as("psFlux"), lit(0.0f).as("psFluxErr"),
            lit("r").as("filterName")).as("diaSource"),
          (col("event_id") * 1000).as("brokerIngestTimestamp"),
          ((col("event_id") % 256).cast("double") / 256.0)
            .as("snn_snia_vs_nonia"),
          ((col("event_id") % 128).cast("double") / 128.0)
            .as("snn_sn_vs_all"),
          ((col("event_id") % 64).cast("double") / 64.0)
            .as("rf_snia_vs_nonia"))
        val routed = graft.alerts.ElasticcSchema.explodePerClass(
          graft.alerts.ElasticcSchema.formatForElasticc(ev, "5.1"))
        routed.select(
          col("alertId"), col("diaSourceId"),
          col("elasticcPublishTimestamp"), col("brokerIngestTimestamp"),
          col("brokerName"), col("brokerVersion"),
          col("classification.classifierName").as("classifier_name"),
          col("classId").as("class_id"),
          col("classification.probability").as("probability"),
          col("topic"))
      },
      Some("""
        WITH base AS (
          SELECT event_id AS alertId,
            event_id + 1000000 AS diaSourceId,
            60000.0 + (event_id % 128)::DOUBLE / 128.0 AS mjd,
            event_id * 1000 AS brokerIngestTimestamp,
            (event_id % 256)::DOUBLE / 256.0 AS snn,
            (event_id % 128)::DOUBLE / 128.0 AS broad,
            (event_id % 64)::DOUBLE / 64.0 AS early
          FROM events),
        entries AS (
          SELECT *, 'SuperNNova SN Ia classifier' AS classifier_name,
            111 AS class_id, snn::FLOAT AS probability FROM base
          UNION ALL SELECT *, 'SuperNNova SN Ia classifier',
            0, (1.0 - snn)::FLOAT FROM base
          UNION ALL SELECT *, 'SuperNNova broad classifier',
            CASE WHEN broad >= 0.5 THEN 221 ELSE 111 END,
            broad::FLOAT FROM base
          UNION ALL SELECT *, 'EarlySN classifier',
            111, early::FLOAT FROM base
          UNION ALL SELECT *, 'EarlySN classifier',
            0, (1.0 - early)::FLOAT FROM base)
        SELECT alertId, diaSourceId,
          CAST((mjd - 40587.0) * 86400000.0 AS BIGINT)
            AS elasticcPublishTimestamp,
          brokerIngestTimestamp,
          'graft' AS brokerName,
          '5.1' AS brokerVersion,
          classifier_name, class_id, probability,
          'elasticc_' || CAST(class_id AS VARCHAR) AS topic
        FROM entries""")),

    // ---- known-TDE shape: remove "asteroids" (one event class), match
    // the lake against a small known-object list (broadcast — the
    // reference's known-TDE catalog is a few dozen rows), reduce to the
    // latest measurement per object, and emit the notification string
    // the reference posts to its messaging channel. Only strings,
    // bigints and raw column bits cross the formatter — no float
    // formatting, so the text is bit-identical cross-engine.
    QueryDef(
      "q76_report_known_tde",
      (s, d) => {
        val ev = t(s, d, "events")
        val known = ev.select("user_id").distinct()
          .filter(col("user_id") % 97 === 0)
          .withColumn("tde_name",
            concat(lit("TDE"), col("user_id").cast("string")))
        ev.filter(col("event_type") =!= "click")
          .withColumn("ts_us", col("ts"))
          .join(broadcast(known), Seq("user_id"))
          .groupBy("user_id", "tde_name")
          .agg(
            max(col("ts_us")).as("last_seen_us"),
            count(lit(1)).as("n_obs"),
            max(col("value")).as("peak"))
          .withColumn("notice",
            concat(lit("• "), col("tde_name"), lit(" — last seen "),
              date_format(timestamp_micros(col("last_seen_us")),
                "yyyy-MM-dd HH:mm:ss"),
              lit(" ("), col("n_obs").cast("string"), lit(" obs)")))
      },
      Some("""
        WITH known AS (
          SELECT DISTINCT user_id,
            'TDE' || CAST(user_id AS VARCHAR) AS tde_name
          FROM events WHERE user_id % 97 = 0)
        SELECT e.user_id, k.tde_name,
          max(epoch_us(e.ts)) AS last_seen_us,
          COUNT(*) AS n_obs,
          max(e.value) AS peak,
          '• ' || k.tde_name || ' — last seen '
            || strftime(make_timestamp(max(epoch_us(e.ts))),
                 '%Y-%m-%d %H:%M:%S')
            || ' (' || CAST(COUNT(*) AS VARCHAR) || ' obs)' AS notice
        FROM events e JOIN known k USING (user_id)
        WHERE e.event_type <> 'click'
        GROUP BY e.user_id, k.tde_name""")),

    // ---- nightly-statistics shape: the reference's one-row-per-night
    // aggregation job — total alerts, distinct objects, per-band
    // conditional counts, distinct exposures, classified count — as a
    // single wide aggregate (its collect-per-metric loop collapses to
    // one scan with map-side partial aggregation).
    QueryDef(
      "q77_report_statistics",
      (s, d) =>
        t(s, d, "events").agg(
          count(lit(1)).as("n_alerts"),
          countDistinct(col("user_id")).as("n_objects"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("n_band_g"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("n_band_r"),
          countDistinct(expr("ts DIV 86400000000"))
            .as("n_exposures"),
          sum(when(col("value") > 100.0, 1L).otherwise(0L))
            .as("n_classified")),
      Some("""
        SELECT COUNT(*) AS n_alerts,
          COUNT(DISTINCT user_id) AS n_objects,
          CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_band_g,
          CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_band_r,
          COUNT(DISTINCT epoch_us(ts) // 86400000000) AS n_exposures,
          CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_classified
        FROM events""")),

    // ---- ssoft shape: the reference's per-object feature-table batch
    // product (ref: bin/ztf/generate_ssoft.py:33-130) — aggregate every
    // object's full lightcurve, drop objects below nmin=50 points, and
    // fit a per-object model. The reference minimizes a phase-curve
    // model per object (the grouped-map path our A6 tracklet operator
    // covers); here the fit is the closed-form OLS trend, computed from
    // decimal-EXACT moments (q49's discipline: day numbers and
    // 2-decimal values sum exactly; every double that follows is the
    // same IEEE expression on identical operands in both engines). One
    // keyed shuffle, all moments map-side combinable — the feature
    // store stays linear at any corpus size.
    QueryDef(
      "q79_ssoft_features",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val day = expr("ts DIV 86400000000")
        val x = day.cast(DecimalType(18, 0))
        val y = col("value").cast(DecimalType(18, 2))
        val n = col("n").cast("double")
        t(s, d, "events")
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n"),
            min(day).as("arc_first_day"),
            max(day).as("arc_last_day"),
            sum(x).cast("double").as("sx"),
            sum(x * x).cast("double").as("sxx"),
            sum(y).cast("double").as("sy"),
            sum(x * y).cast("double").as("sxy"),
            min(col("value")).as("v_min"),
            max(col("value")).as("v_max"))
          .filter(col("n") >= 50)
          .withColumn("arc_days",
            col("arc_last_day") - col("arc_first_day"))
          // NULL (not Inf/NaN) when all points share one day: Spark
          // double x/0 is Inf but DuckDB's is NULL, so both engines
          // must take the NULL branch for the oracle to agree.
          .withColumn("slope",
            when(n * col("sxx") - col("sx") * col("sx") =!= 0.0,
              (n * col("sxy") - col("sx") * col("sy")) /
                (n * col("sxx") - col("sx") * col("sx"))))
          .withColumn("intercept",
            (col("sy") - col("slope") * col("sx")) / n)
      },
      Some("""
        SELECT user_id, n, arc_first_day, arc_last_day, sx, sxx, sy, sxy,
          v_min, v_max, arc_days,
          (n_d * sxy - sx * sy) / nullif(n_d * sxx - sx * sx, 0) AS slope,
          (sy - ((n_d * sxy - sx * sy)
            / nullif(n_d * sxx - sx * sx, 0)) * sx)
            / n_d AS intercept
        FROM (
          SELECT user_id,
            COUNT(*) AS n,
            CAST(COUNT(*) AS DOUBLE) AS n_d,
            MIN(epoch_us(ts) // 86400000000) AS arc_first_day,
            MAX(epoch_us(ts) // 86400000000) AS arc_last_day,
            CAST(SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,0)))
              AS DOUBLE) AS sx,
            CAST(SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,0))
                   * CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,0)))
              AS DOUBLE) AS sxx,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,0))
                   * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
            MIN(value) AS v_min,
            MAX(value) AS v_max,
            MAX(epoch_us(ts) // 86400000000)
              - MIN(epoch_us(ts) // 86400000000) AS arc_days
          FROM events GROUP BY user_id)
        WHERE n >= 50""")),

    // ---- symbiotic/CV shape: crossmatch label carrying "name,category"
    // → split → fast-decline cut → two category branches with different
    // thresholds, each tagged with its channel, unioned
    // (ref: bin/ztf/archive_symbiotic_and_cv_stars.py:103-136). The
    // label is planted by the SAME expression in both engines; dmag is
    // one IEEE division+negation on identical operands.
    QueryDef(
      "q83_report_symbiotic_cv",
      (s, d) => {
        val lab = when(col("user_id") % 13 === 0,
            concat(lit("SY"), col("user_id").cast("string"),
              lit(",symbiotic_stars")))
          .when(col("user_id") % 13 === 1,
            concat(lit("CV"), col("user_id").cast("string"),
              lit(",cataclysmic_variables")))
          .otherwise(lit("Unknown"))
        val base = t(s, d, "events")
          .withColumn("symbiotic", lab)
          .filter(col("symbiotic") =!= "Unknown")
          .withColumn("dmag", -col("value") / 50.0)
          .filter(col("dmag") <= -0.5)
          .withColumn("name", split(col("symbiotic"), ",").getItem(0))
          .withColumn("cat", split(col("symbiotic"), ",").getItem(1))
        val sym = base.filter(col("cat") === "symbiotic_stars")
          .withColumn("channel", lit("@fink_symbiotic_stars"))
        val cvs = base.filter(col("cat") === "cataclysmic_variables" &&
          col("dmag") <= -3.0)
          .withColumn("channel", lit("@fink_cv_stars"))
        sym.unionByName(cvs)
          .select("event_id", "user_id", "name", "cat", "dmag", "channel")
      },
      Some("""
        WITH lab AS (
          SELECT event_id, user_id, value,
            CASE WHEN user_id % 13 = 0 THEN 'SY'
                   || CAST(user_id AS VARCHAR) || ',symbiotic_stars'
                 WHEN user_id % 13 = 1 THEN 'CV'
                   || CAST(user_id AS VARCHAR) || ',cataclysmic_variables'
                 ELSE 'Unknown' END AS symbiotic
          FROM events),
        base AS (
          SELECT event_id, user_id,
            split_part(symbiotic, ',', 1) AS name,
            split_part(symbiotic, ',', 2) AS cat,
            -value / 50.0 AS dmag
          FROM lab
          WHERE symbiotic <> 'Unknown' AND -value / 50.0 <= -0.5)
        SELECT event_id, user_id, name, cat, dmag,
          '@fink_symbiotic_stars' AS channel
        FROM base WHERE cat = 'symbiotic_stars'
        UNION ALL
        SELECT event_id, user_id, name, cat, dmag, '@fink_cv_stars'
        FROM base
        WHERE cat = 'cataclysmic_variables' AND dmag <= -3.0""")),

    // ---- blazar extreme-states shape: per-row statistics packed into a
    // map column, extracted via getItem, low/high state branches off one
    // scan, unioned with a state tag + serving row key
    // (ref: bin/ztf/archive_extreme_states_blazar.py:106-160). The map
    // build+extract is the Spark-side operator under test (X4); the
    // oracle computes the same DYADIC values directly, so every double
    // is bit-identical cross-engine.
    QueryDef(
      "q84_report_blazar_states",
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("blazar_stats", map(
            lit("instantness"),
            (col("event_id") % 256).cast("double") / 256.0,
            lit("robustness"),
            (col("event_id") % 128).cast("double") / 128.0))
          .withColumn("instantness",
            col("blazar_stats").getItem("instantness"))
          .withColumn("robustness",
            col("blazar_stats").getItem("robustness"))
        val low = ev
          .filter(col("instantness") <= 0.125 && col("robustness") <= 0.25)
          .withColumn("state", lit("low"))
        val high = ev
          .filter(col("instantness") >= 0.875 && col("robustness") >= 0.75)
          .withColumn("state", lit("high"))
        low.unionByName(high)
          .withColumn("row_key",
            concat_ws("_", col("event_id").cast("string"),
              col("user_id").cast("string")))
          .select("event_id", "user_id", "instantness", "robustness",
            "state", "row_key")
      },
      Some("""
        WITH s AS (
          SELECT event_id, user_id,
            (event_id % 256)::DOUBLE / 256.0 AS instantness,
            (event_id % 128)::DOUBLE / 128.0 AS robustness
          FROM events)
        SELECT event_id, user_id, instantness, robustness,
          'low' AS state,
          CAST(event_id AS VARCHAR) || '_' || CAST(user_id AS VARCHAR)
            AS row_key
        FROM s WHERE instantness <= 0.125 AND robustness <= 0.25
        UNION ALL
        SELECT event_id, user_id, instantness, robustness, 'high',
          CAST(event_id AS VARCHAR) || '_' || CAST(user_id AS VARCHAR)
        FROM s WHERE instantness >= 0.875 AND robustness >= 0.75""")),

    // ---- Ia active-learning shape: distance to the 0.5 decision
    // boundary, stacked quality gates, then TWO capped rankings off the
    // same filtered frame — closest-to-boundary ascending (the learner's
    // next queries) and high-probability descending — unioned with a
    // branch tag (ref: bin/ztf/archive_ia_active_learning.py:146-196).
    // Scores are dyadic (k/256) so |p−0.5| is exact; ties break on
    // event_id, making both LIMITs deterministic cross-engine.
    QueryDef(
      "q85_report_al_loop",
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("al_score",
            (col("event_id") % 256).cast("double") / 256.0)
          .withColumn("dist_center", abs(col("al_score") - 0.5))
          .filter(col("event_type").isin("view", "click") &&
            col("user_id") % 3 =!= 0 && col("value") <= 150.0)
        val queried = ev
          .orderBy(col("dist_center").asc, col("event_id").asc)
          .limit(30).withColumn("branch", lit("queried"))
        val high = ev.filter(col("al_score") > 0.5)
          .orderBy(col("al_score").desc, col("event_id").asc)
          .limit(30).withColumn("branch", lit("highprob"))
        queried.unionByName(high)
          .select("event_id", "user_id", "al_score", "dist_center", "branch")
      },
      Some("""
        WITH f AS (
          SELECT event_id, user_id,
            (event_id % 256)::DOUBLE / 256.0 AS al_score,
            abs((event_id % 256)::DOUBLE / 256.0 - 0.5) AS dist_center
          FROM events
          WHERE event_type IN ('view', 'click') AND user_id % 3 <> 0
            AND value <= 150.0)
        SELECT event_id, user_id, al_score, dist_center,
          'queried' AS branch
        FROM (SELECT * FROM f
              ORDER BY dist_center ASC, event_id ASC LIMIT 30)
        UNION ALL
        SELECT event_id, user_id, al_score, dist_center, 'highprob'
        FROM (SELECT * FROM f WHERE al_score > 0.5
              ORDER BY al_score DESC, event_id ASC LIMIT 30)""")),

    // ---- q207: RFM segmentation — recency/frequency/monetary quintile
    //      scores per customer WITHOUT a global rank: each dimension's
    //      4 quintile cut points come from one percentile_disc aggregate
    //      row that broadcasts back, and the score is `1 + #cuts below`
    //      (pure per-row integer comparisons). An ntile would need an
    //      unpartitioned window — the single-task trap the repo lint
    //      forbids; threshold binning is the shape that survives a
    //      customer table at any scale. Output is the bounded 125-cell
    //      segment matrix. ----
    QueryDef(
      "q207_rfm_segments",
      (s, d) => {
        val cust = t(s, d, "orders")
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 10000 +
              month(col("o_orderdate")) * 100 +
              dayofmonth(col("o_orderdate"))).cast("long").as("datekey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy("o_custkey")
          .agg(max(col("datekey")).as("r"),
            count(lit(1)).as("f"),
            sum(col("cents")).as("m"))
        def cuts(c: String) = Seq(0.2, 0.4, 0.6, 0.8).map(p =>
          expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $c)")
            .cast("long").as(s"${c}_${(p * 100).toInt}"))
        val cut = cust.agg(cuts("r").head,
          (cuts("r").tail ++ cuts("f") ++ cuts("m")): _*)
        def score(c: String) =
          (lit(1) + (col(c) > col(s"${c}_20")).cast("int") +
            (col(c) > col(s"${c}_40")).cast("int") +
            (col(c) > col(s"${c}_60")).cast("int") +
            (col(c) > col(s"${c}_80")).cast("int")).cast("long")
        cust.crossJoin(broadcast(cut))
          .select(col("o_custkey"), col("m"),
            score("r").as("rs"), score("f").as("fs"), score("m").as("ms"))
          .groupBy("rs", "fs", "ms")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("m")).as("seg_cents"))
      },
      Some("""
        WITH cust AS (
          SELECT o_custkey,
            MAX(CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
              + day(o_orderdate) AS BIGINT)) AS r,
            COUNT(*) AS f,
            CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS m
          FROM orders GROUP BY 1),
        cut AS (
          SELECT
            quantile_disc(r, 0.2) AS r_20, quantile_disc(r, 0.4) AS r_40,
            quantile_disc(r, 0.6) AS r_60, quantile_disc(r, 0.8) AS r_80,
            quantile_disc(f, 0.2) AS f_20, quantile_disc(f, 0.4) AS f_40,
            quantile_disc(f, 0.6) AS f_60, quantile_disc(f, 0.8) AS f_80,
            quantile_disc(m, 0.2) AS m_20, quantile_disc(m, 0.4) AS m_40,
            quantile_disc(m, 0.6) AS m_60, quantile_disc(m, 0.8) AS m_80
          FROM cust),
        scored AS (
          SELECT o_custkey, m,
            CAST(1 + (r > r_20)::INT + (r > r_40)::INT + (r > r_60)::INT
              + (r > r_80)::INT AS BIGINT) AS rs,
            CAST(1 + (f > f_20)::INT + (f > f_40)::INT + (f > f_60)::INT
              + (f > f_80)::INT AS BIGINT) AS fs,
            CAST(1 + (m > m_20)::INT + (m > m_40)::INT + (m > m_60)::INT
              + (m > m_80)::INT AS BIGINT) AS ms
          FROM cust, cut)
        SELECT rs, fs, ms, COUNT(*) AS n_customers,
          CAST(SUM(m) AS BIGINT) AS seg_cents
        FROM scored GROUP BY 1, 2, 3""")),

    // ---- q215: cohort LTV curve — cumulative revenue per acquisition
    //      cohort by age: users cohort on their FIRST 30-day bucket,
    //      revenue rolls up per (cohort, age), the cumsum window keys
    //      by cohort, and LTV-per-user ships as exact integer micro-
    //      cents-per-user (cum·1e6 div cohort_size). The payback-curve
    //      readout behind every acquisition-spend decision; q127's
    //      retention counts say who stays, this says what they're
    //      worth. Two keyed exchanges (user, then cohort). ----
    QueryDef(
      "q215_cohort_ltv",
      (s, d) => {
        val BucketUs = 2592000000000L // 30 days
        val ev = t(s, d, "events")
          .select(col("user_id"), expr(s"ts div $BucketUs").as("mb"),
            round(col("value") * 100).cast("long").as("cents"))
        val cohort = ev.groupBy("user_id")
          .agg(min(col("mb")).as("cohort"))
        val sizes = cohort.groupBy("cohort")
          .agg(count(lit(1)).as("n_users"))
        val byAge = ev.join(cohort, Seq("user_id"))
          .withColumn("age", col("mb") - col("cohort"))
          .groupBy("cohort", "age")
          .agg(sum(col("cents")).as("rev_cents"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cohort").orderBy("age")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        byAge
          .withColumn("cum_cents", sum(col("rev_cents")).over(w))
          .join(broadcast(sizes), Seq("cohort"))
          .select(col("cohort"), col("age"), col("n_users"),
            col("rev_cents"), col("cum_cents"),
            expr("cum_cents * 1000000 div n_users").as("ltv_ucents_pu"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 2592000000000 AS mb,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events),
        cohort AS (
          SELECT user_id, MIN(mb) AS cohort FROM ev GROUP BY 1),
        sizes AS (
          SELECT cohort, COUNT(*) AS n_users FROM cohort GROUP BY 1),
        byage AS (
          SELECT c.cohort, e.mb - c.cohort AS age,
            CAST(SUM(e.cents) AS BIGINT) AS rev_cents
          FROM ev e JOIN cohort c USING (user_id)
          GROUP BY 1, 2),
        cum AS (
          SELECT cohort, age, rev_cents,
            CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY age
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
          FROM byage)
        SELECT cohort, age, n_users, rev_cents, cum_cents,
          cum_cents * 1000000 // n_users AS ltv_ucents_pu
        FROM cum JOIN sizes USING (cohort)""")),

    // ---- q225: scorecard construction — the credit-scoring shape:
    //      per-user behavioral features (non-purchase activity only —
    //      the outcome event never leaks into its own features), each
    //      binned into terciles by broadcast disc cuts (the q207
    //      threshold discipline, no global rank), points summed into a
    //      0–6 score, and the score bands read out with their actual
    //      conversion rates — the calibration table that decides
    //      whether the points mean anything. All integer; two keyed
    //      aggregates + broadcast cuts. ----
    QueryDef(
      "q225_scorecard",
      (s, d) => {
        val ev = t(s, d, "events")
        val feat = ev.filter(col("event_type") =!= "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("f"),
            sum(round(col("value") * 100).cast("long")).as("m"),
            countDistinct(expr("ts div 86400000000")).as("r"))
        val buyers = ev.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
          .withColumn("bought", lit(1L))
        def cuts(c: String) = Seq(1.0 / 3, 2.0 / 3).map(p =>
          expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $c)")
            .cast("long").as(s"${c}_${if (p < 0.5) 1 else 2}"))
        val cut = feat.agg(cuts("f").head,
          (cuts("f").tail ++ cuts("m") ++ cuts("r")): _*)
        def pts(c: String) =
          ((col(c) > col(s"${c}_1")).cast("long") +
            (col(c) > col(s"${c}_2")).cast("long"))
        feat.crossJoin(broadcast(cut))
          .join(buyers, Seq("user_id"), "left")
          .select(col("user_id"),
            (pts("f") + pts("m") + pts("r")).as("score"),
            coalesce(col("bought"), lit(0L)).as("bought"))
          .groupBy("score")
          .agg(count(lit(1)).as("n_users"),
            sum(col("bought")).as("n_buyers"))
          .withColumn("conv_ppm",
            expr("n_buyers * 1000000 div n_users"))
      },
      Some("""
        WITH feat AS (
          SELECT user_id, COUNT(*) AS f,
            CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
              AS m,
            CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT)
              AS r
          FROM events WHERE event_type <> 'purchase'
          GROUP BY 1),
        buyers AS (
          SELECT DISTINCT user_id, 1 AS bought FROM events
          WHERE event_type = 'purchase'),
        cut AS (
          SELECT
            quantile_disc(f, 1.0/3) AS f_1, quantile_disc(f, 2.0/3) AS f_2,
            quantile_disc(m, 1.0/3) AS m_1, quantile_disc(m, 2.0/3) AS m_2,
            quantile_disc(r, 1.0/3) AS r_1, quantile_disc(r, 2.0/3) AS r_2
          FROM feat),
        scored AS (
          SELECT user_id,
            CAST((f > f_1)::INT + (f > f_2)::INT + (m > m_1)::INT
              + (m > m_2)::INT + (r > r_1)::INT + (r > r_2)::INT
              AS BIGINT) AS score,
            CAST(COALESCE(bought, 0) AS BIGINT) AS bought
          FROM feat CROSS JOIN cut LEFT JOIN buyers USING (user_id))
        SELECT score, COUNT(*) AS n_users,
          CAST(SUM(bought) AS BIGINT) AS n_buyers,
          CAST(SUM(bought) AS BIGINT) * 1000000 // COUNT(*) AS conv_ppm
        FROM scored GROUP BY score""")),

    // ---- q229: cumulative gains curve — ranking users by activity
    //      score, what share of all buyers does each descending score
    //      decile capture? Deciles come from broadcast percentile cuts
    //      (never a global rank window); the 10-row decile table folds
    //      to cumulative on the DRIVER (the q190/q213 bounded-collect
    //      precedent — 10 rows by construction). The model-targeting
    //      readout: random targeting is the 45° line, gains above it
    //      is what the score buys. ----
    QueryDef(
      "q229_gains_curve",
      (s, d) => {
        val ev = t(s, d, "events")
        val feat = ev.filter(col("event_type") =!= "purchase")
          .groupBy("user_id").agg(count(lit(1)).as("f"))
        val buyers = ev.filter(col("event_type") === "purchase")
          .select("user_id").distinct().withColumn("bought", lit(1L))
        val cut = feat.agg(array((1 to 9).map(k =>
          expr(s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY f)")
            .cast("long")): _*).as("cuts"))
        val perDecile = feat.crossJoin(broadcast(cut))
          .withColumn("decile", // 10 = most active
            lit(1) + size(filter(col("cuts"), c => col("f") > c)))
          .join(buyers, Seq("user_id"), "left")
          .groupBy("decile")
          .agg(count(lit(1)).as("n_users"),
            sum(coalesce(col("bought"), lit(0L))).as("n_buyers"))
          .collect().sortBy(-_.getAs[Int]("decile"))
        val totB = perDecile.map(_.getAs[Long]("n_buyers")).sum
        val rows = perDecile.scanLeft((0, 0L, 0L, 0L)) {
          case ((_, _, _, cum), r) =>
            (r.getAs[Int]("decile"), r.getAs[Long]("n_users"),
              r.getAs[Long]("n_buyers"),
              cum + r.getAs[Long]("n_buyers"))
        }.tail.map { case (dec, nu, nb, cum) =>
          (dec.toLong, nu, nb, cum,
            if (totB == 0) 0L else cum * 1000000L / totB)
        }
        val spark0 = ev.sparkSession
        import spark0.implicits._
        rows.toSeq.toDF("decile", "n_users", "n_buyers", "cum_buyers",
          "gains_ppm")
      },
      Some("""
        WITH feat AS (
          SELECT user_id, COUNT(*) AS f FROM events
          WHERE event_type <> 'purchase' GROUP BY 1),
        buyers AS (
          SELECT DISTINCT user_id, 1 AS bought FROM events
          WHERE event_type = 'purchase'),
        cut AS (
          SELECT quantile_disc(f,
            [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts
          FROM feat),
        sc AS (
          SELECT user_id, f,
            1 + len(list_filter(cuts, c -> f > c)) AS decile,
            COALESCE(bought, 0) AS bought
          FROM feat CROSS JOIN cut LEFT JOIN buyers USING (user_id)),
        pd AS (
          SELECT decile, COUNT(*) AS n_users,
            CAST(SUM(bought) AS BIGINT) AS n_buyers
          FROM sc GROUP BY 1),
        cumed AS (
          SELECT CAST(decile AS BIGINT) AS decile, n_users, n_buyers,
            CAST(SUM(n_buyers) OVER (ORDER BY decile DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_buyers,
            CAST(SUM(n_buyers) OVER () AS BIGINT) AS tot
          FROM pd)
        SELECT decile, n_users, n_buyers, cum_buyers,
          CASE WHEN tot = 0 THEN 0
            ELSE cum_buyers * 1000000 // tot END AS gains_ppm
        FROM cumed""")),

    // ---- q237: audience overlap — Jaccard of USER SETS between every
    //      event-type pair (q221 compares value DISTRIBUTIONS; this
    //      compares who): the deduped (type, user) table self-joins on
    //      USER (each user contributes their type-pair combinations —
    //      bounded by the type count squared per user, never a row
    //      product), and set sizes broadcast back. The audience-
    //      planning matrix behind every cross-sell and frequency-cap
    //      decision. ----
    QueryDef(
      "q237_audience_overlap",
      (s, d) => {
        val tu = t(s, d, "events")
          .select(col("event_type"), col("user_id")).distinct()
        val sz = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
        tu.select(col("user_id"), col("event_type").as("ta"))
          .join(tu.select(col("user_id"), col("event_type").as("tb")),
            Seq("user_id"))
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb")
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sz.select(col("event_type").as("ta"),
            col("n").as("n_a"))), Seq("ta"))
          .join(broadcast(sz.select(col("event_type").as("tb"),
            col("n").as("n_b"))), Seq("tb"))
          .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
            col("n_both"),
            expr("n_both * 1000000 div (n_a + n_b - n_both)")
              .as("jaccard_ppm"))
      },
      Some("""
        WITH tu AS (
          SELECT DISTINCT event_type, user_id FROM events),
        sz AS (
          SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
        p AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
            COUNT(*) AS n_both
          FROM tu a JOIN tu b ON a.user_id = b.user_id
            AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT ta, tb, x.n AS n_a, y.n AS n_b, n_both,
          n_both * 1000000 // (x.n + y.n - n_both) AS jaccard_ppm
        FROM p
        JOIN sz x ON x.event_type = p.ta
        JOIN sz y ON y.event_type = p.tb""")),

    // ---- q257: revenue bridge (price/volume waterfall) — the FP&A
    //      decomposition of period-over-period revenue change per
    //      brand: volume effect = Δqty · (old unit revenue, exact
    //      µ-cents via integer division), price/mix = the residual so
    //      the bridge ADDS UP EXACTLY (vol + price_mix = Δrev·10⁶ by
    //      construction — no float leakage, no unexplained
    //      remainder). Periods split the order-date range in half via
    //      a broadcast min/max row; parts absent from a period carry
    //      zero. Two keyed aggregates + one part-keyed full-outer
    //      join, rolled up to brands. ----
    QueryDef(
      "q257_revenue_bridge",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").select(col("o_orderkey"),
            col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"),
            (year(col("o_orderdate")) * 10000 +
              month(col("o_orderdate")) * 100 +
              dayofmonth(col("o_orderdate"))).cast("long").as("dk"),
            col("l_quantity").cast("long").as("q"),
            round(col("l_extendedprice") * 100).cast("long").as("r"))
        val rng = li.agg(min(col("dk")).as("lo"), max(col("dk")).as("hi"))
        // conditional spread by l_partkey (guide §2.4: orders
        // broadcasts, so the stream side kept the scan's single
        // partition) — the period aggregate below is then clustered
        // (no exchange), and the persisted ~2-rows-per-part result
        // serves BOTH period branches and the part-keyed full-outer
        // join without re-running the corpus pass per branch or
        // re-shuffling. The gate probes the lineitem SCAN (li itself
        // contains a join, which can't answer getNumPartitions without
        // materializing query stages); no-op on a many-file table.
        val per = graft.operators.InputSpread.byKey(
            li, col("l_partkey"),
            probe = t(s, d, "lineitem").select(col("l_partkey")))
          .crossJoin(broadcast(rng))
          .withColumn("h",
            when(col("dk") * 2 <= col("lo") + col("hi"), 1L)
              .otherwise(2L))
          .groupBy("l_partkey", "h")
          .agg(sum(col("q")).as("q"), sum(col("r")).as("r"))
          .persist()
        val p1 = per.filter(col("h") === 1)
          .select(col("l_partkey"), col("q").as("q1"), col("r").as("r1"))
        val p2 = per.filter(col("h") === 2)
          .select(col("l_partkey"), col("q").as("q2"), col("r").as("r2"))
        p1.join(p2, Seq("l_partkey"), "full_outer")
          .na.fill(0L, Seq("q1", "r1", "q2", "r2"))
          .withColumn("vol_e6",
            when(col("q1") > 0,
              (col("q2") - col("q1")) * expr("r1 * 1000000 div q1"))
              .otherwise(lit(0L)))
          .withColumn("d_rev_e6", (col("r2") - col("r1")) * 1000000L)
          .withColumn("price_mix_e6", col("d_rev_e6") - col("vol_e6"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_parts"),
            sum(col("d_rev_e6")).as("d_rev_e6"),
            sum(col("vol_e6")).as("vol_e6"),
            sum(col("price_mix_e6")).as("price_mix_e6"))
      },
      Some("""
        WITH li AS (
          SELECT l_partkey,
            CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
              + day(o_orderdate) AS BIGINT) AS dk,
            CAST(l_quantity AS BIGINT) AS q,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS r
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        rng AS (SELECT MIN(dk) AS lo, MAX(dk) AS hi FROM li),
        per AS (
          SELECT l_partkey,
            CASE WHEN dk * 2 <= lo + hi THEN 1 ELSE 2 END AS h,
            CAST(SUM(q) AS BIGINT) AS q, CAST(SUM(r) AS BIGINT) AS r
          FROM li, rng GROUP BY 1, 2),
        p1 AS (SELECT l_partkey, q AS q1, r AS r1 FROM per WHERE h = 1),
        p2 AS (SELECT l_partkey, q AS q2, r AS r2 FROM per WHERE h = 2),
        j AS (
          SELECT COALESCE(p1.l_partkey, p2.l_partkey) AS l_partkey,
            COALESCE(q1, 0) AS q1, COALESCE(r1, 0) AS r1,
            COALESCE(q2, 0) AS q2, COALESCE(r2, 0) AS r2
          FROM p1 FULL OUTER JOIN p2 USING (l_partkey)),
        eff AS (
          SELECT l_partkey, q1, r1, q2, r2,
            CASE WHEN q1 > 0
              THEN (q2 - q1) * (r1 * 1000000 // q1) ELSE 0 END
              AS vol_e6,
            (r2 - r1) * 1000000 AS d_rev_e6
          FROM j)
        SELECT p_brand, COUNT(*) AS n_parts,
          CAST(SUM(d_rev_e6) AS BIGINT) AS d_rev_e6,
          CAST(SUM(vol_e6) AS BIGINT) AS vol_e6,
          CAST(SUM(d_rev_e6 - vol_e6) AS BIGINT) AS price_mix_e6
        FROM eff JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    // ---- q271: ABC classification — parts bucketed A/B/C by
    //      CUMULATIVE revenue share (A carries the first 80%, B to
    //      95%, C the tail). The global ordered prefix sum comes from
    //      [[graft.operators.PrefixScan]] — banded disc-percentile
    //      cuts + within-band windows + broadcast band offsets — never
    //      a single-partition window; the DuckDB oracle IS a plain
    //      global window, so hash equality certifies two-level scan ==
    //      global scan. All int64; shares in exact ppm. ----
    QueryDef(
      "q271_abc_classification",
      (s, d) => {
        // PrefixScan reads its input 3x (cuts, scan, band totals) and
        // the total once more: persist the small per-part aggregate so
        // lineitem is scanned and shuffled exactly once
        val rev = t(s, d, "lineitem")
          .select(col("l_partkey"),
            round(col("l_extendedprice") * 100).cast("long").as("r"))
          .groupBy("l_partkey").agg(sum(col("r")).as("x"))
          .withColumn("negx", -col("x"))
          .persist()
        val scanned = graft.operators.PrefixScan.runningSum(
          rev, "negx", Seq("l_partkey"), "x", "c")
        val tot = rev.agg(sum(col("x")).as("t"))
        scanned.crossJoin(broadcast(tot))
          .withColumn("cls",
            when(col("c") * 100 <= col("t") * 80, 0L)
              .when(col("c") * 100 <= col("t") * 95, 1L)
              .otherwise(2L))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_parts"), sum(col("x")).as("rev_cents"),
            max(col("t")).as("t"))
          .withColumn("share_ppm", expr("rev_cents * 1000000 div t"))
          .select("cls", "n_parts", "rev_cents", "share_ppm")
      },
      Some("""
        WITH rev AS (
          SELECT l_partkey,
            CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS x
          FROM lineitem GROUP BY 1),
        tot AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM rev),
        cum AS (
          SELECT l_partkey, x,
            CAST(SUM(x) OVER (ORDER BY x DESC, l_partkey
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
          FROM rev)
        SELECT CASE WHEN c * 100 <= t * 80 THEN 0
            WHEN c * 100 <= t * 95 THEN 1 ELSE 2 END AS cls,
          COUNT(*) AS n_parts, CAST(SUM(x) AS BIGINT) AS rev_cents,
          CAST(SUM(x) AS BIGINT) * 1000000 // t AS share_ppm
        FROM cum, tot GROUP BY 1, t""")),

    // ---- q272: double-charge audit — candidate duplicate events:
    //      same user, same event type, same dollar amount, within 7
    //      days. The pair generator is the banded range join
    //      (operators/RangeJoin): each left row fans to two
    //      week-buckets of a composite (user, type, usd) key, the
    //      join is pure equi — never an inequality join / BNLJ. The
    //      asymmetric (earlier, later) tie rule counts each unordered
    //      pair exactly once. Pairs roll up per event type. ----
    QueryDef(
      "q272_double_charge",
      (s, d) => {
        val o = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            concat_ws("#", col("user_id"), col("event_type"),
              round(col("value")).cast("long")).as("k"),
            expr("ts div 1000000").as("sec"))
        val left = o.select(col("k"), col("user_id").as("uid"),
          col("event_type").as("et"), col("sec").as("sec_a"),
          col("event_id").as("ea"))
        val right = o.select(col("k"), col("sec").as("sec_b"),
          col("event_id").as("eb"))
        graft.operators.RangeJoin
          .bandJoin(left, right, "k", "sec_a", "sec_b", 604800L)
          .filter(col("sec_a") < col("sec_b") ||
            (col("sec_a") === col("sec_b") && col("ea") < col("eb")))
          .groupBy(col("et").as("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("uid")).as("n_users"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, event_id, event_type,
            CAST(round("value") AS BIGINT) AS usd,
            epoch_us(ts) // 1000000 AS sec
          FROM events),
        pairs AS (
          SELECT a.user_id AS uid, a.event_type AS et
          FROM o a JOIN o b
            ON a.user_id = b.user_id AND a.event_type = b.event_type
            AND a.usd = b.usd
            AND b.sec >= a.sec AND b.sec <= a.sec + 604800
            AND (a.sec < b.sec OR (a.sec = b.sec
              AND a.event_id < b.event_id)))
        SELECT et AS event_type, COUNT(*) AS n_pairs,
          CAST(COUNT(DISTINCT uid) AS BIGINT) AS n_users
        FROM pairs GROUP BY 1""")),

    // ---- q273: HHI market concentration — the antitrust readout per
    //      nation: supplier revenue shares in floor-divided basis
    //      points, HHI = Σ share_bp² (0..10⁸), plus the top share.
    //      Floor division is applied identically on both engines, so
    //      the metric is deterministic integer math end to end — no
    //      share ever materializes as a float. Two keyed aggregates +
    //      a broadcast per-nation total. ----
    QueryDef(
      "q273_hhi_concentration",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .select(col("l_suppkey"),
            round(col("l_extendedprice")).cast("long").as("r"))
          .groupBy("l_suppkey").agg(sum(col("r")).as("x"))
          .join(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
        val tot = rev.groupBy("s_nationkey").agg(sum(col("x")).as("tn"))
        rev.join(broadcast(tot), Seq("s_nationkey"))
          .withColumn("share_bp", expr("x * 10000 div tn"))
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_suppliers"), max(col("tn")).as("t_usd"),
            sum(col("share_bp") * col("share_bp")).as("hhi_bp2"),
            max(col("share_bp")).as("top_share_bp"))
      },
      Some("""
        WITH rev AS (
          SELECT s_nationkey, l_suppkey,
            CAST(SUM(CAST(round(l_extendedprice) AS BIGINT))
              AS BIGINT) AS x
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY 1, 2),
        tot AS (
          SELECT s_nationkey, CAST(SUM(x) AS BIGINT) AS tn
          FROM rev GROUP BY 1),
        sh AS (
          SELECT rev.s_nationkey, x * 10000 // tn AS share_bp, tn
          FROM rev JOIN tot ON rev.s_nationkey = tot.s_nationkey)
        SELECT s_nationkey, COUNT(*) AS n_suppliers, MAX(tn) AS t_usd,
          CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi_bp2,
          MAX(share_bp) AS top_share_bp
        FROM sh GROUP BY 1""")),

    // ---- q282: ABC/XYZ matrix — the inventory-planning grid that
    //      crosses VALUE concentration (A/B/C by cumulative revenue
    //      share, the q271 PrefixScan) with DEMAND PREDICTABILITY
    //      (X/Y/Z by the squared coefficient of variation of weekly
    //      shipped quantity, zero-weeks included via the global week
    //      count): A-X items are forecast-and-automate, C-Z are
    //      review-manually. CV² stays EXACT by integer cross-
    //      multiplication — X ⇔ W·(W·Σq²−(Σq)²) ≤ 15·(W−1)·(Σq)²,
    //      never a float division; thresholds 15/18 sit inside this
    //      corpus's observed CV² band so all classes populate. Two
    //      part-keyed aggregates + the banded scan; output is the
    //      3×3 matrix with per-cell revenue. ----
    QueryDef(
      "q282_abc_xyz",
      (s, d) => {
        // conditional spread by l_partkey off the single-task scan
        // (guide §2.4): both keyed aggregates below (rev by l_partkey,
        // wkAgg by (l_partkey, wk)) are clustered by this one exchange
        // and run with no further shuffle, and the cache — read by
        // both — holds 32-way partitions instead of the scan's single
        // one. No-op on a many-file table (the gate).
        val li = graft.operators.InputSpread.byKey(
            t(s, d, "lineitem")
              .select(col("l_partkey"),
                round(col("l_extendedprice") * 100).cast("long").as("r"),
                col("l_quantity").cast("long").as("q"),
                (datediff(col("l_shipdate").cast("date"),
                  lit("1970-01-01").cast("date")) / 7).cast("long").as("wk")),
            col("l_partkey"))
          .persist()
        val rev = li.groupBy("l_partkey").agg(sum(col("r")).as("x"))
          .withColumn("negx", -col("x")).persist()
        val scanned = graft.operators.PrefixScan.runningSum(
          rev, "negx", Seq("l_partkey"), "x", "c")
        val tot = rev.agg(sum(col("x")).as("t"))
        val abc = scanned.crossJoin(broadcast(tot))
          .withColumn("abc",
            when(col("c") * 100 <= col("t") * 80, 0L)
              .when(col("c") * 100 <= col("t") * 95, 1L)
              .otherwise(2L))
          .select("l_partkey", "x", "abc")
        val wkAgg = li.groupBy("l_partkey", "wk")
          .agg(sum(col("q")).as("qw"))
        val nW = wkAgg.agg(countDistinct(col("wk")).as("W"))
        val xyz = wkAgg.groupBy("l_partkey")
          .agg(sum(col("qw")).as("sx"),
            sum(col("qw") * col("qw")).as("sxx"))
          .crossJoin(broadcast(nW))
          .withColumn("lhs",
            col("W") * (col("W") * col("sxx") - col("sx") * col("sx")))
          .withColumn("rhs1",
            lit(15L) * (col("W") - 1L) * col("sx") * col("sx"))
          .withColumn("rhs2",
            lit(18L) * (col("W") - 1L) * col("sx") * col("sx"))
          .withColumn("xyz",
            when(col("lhs") <= col("rhs1"), 0L)
              .when(col("lhs") <= col("rhs2"), 1L).otherwise(2L))
          .select("l_partkey", "xyz")
        abc.join(xyz, Seq("l_partkey"))
          .groupBy("abc", "xyz")
          .agg(count(lit(1)).as("n_parts"), sum(col("x")).as("rev_cents"))
      },
      Some("""
        WITH li AS (
          SELECT l_partkey,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS r,
            CAST(l_quantity AS BIGINT) AS q,
            CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
              // 7 AS wk
          FROM lineitem),
        rev AS (
          SELECT l_partkey, CAST(SUM(r) AS BIGINT) AS x
          FROM li GROUP BY 1),
        tot AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM rev),
        cum AS (
          SELECT l_partkey, x,
            CAST(SUM(x) OVER (ORDER BY x DESC, l_partkey
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
          FROM rev),
        abc AS (
          SELECT l_partkey, x,
            CASE WHEN c * 100 <= t * 80 THEN 0
              WHEN c * 100 <= t * 95 THEN 1 ELSE 2 END AS abc
          FROM cum, tot),
        wkagg AS (
          SELECT l_partkey, wk, CAST(SUM(q) AS BIGINT) AS qw
          FROM li GROUP BY 1, 2),
        ww AS (SELECT CAST(COUNT(DISTINCT wk) AS BIGINT) AS W
          FROM wkagg),
        xyz AS (
          SELECT l_partkey,
            CASE WHEN W * (W * sxx - sx * sx)
                <= 15 * (W - 1) * sx * sx THEN 0
              WHEN W * (W * sxx - sx * sx)
                <= 18 * (W - 1) * sx * sx THEN 1 ELSE 2 END AS xyz
          FROM (SELECT l_partkey, CAST(SUM(qw) AS BIGINT) AS sx,
                  CAST(SUM(qw * qw) AS BIGINT) AS sxx
                FROM wkagg GROUP BY 1), ww)
        SELECT abc, xyz, COUNT(*) AS n_parts,
          CAST(SUM(x) AS BIGINT) AS rev_cents
        FROM abc JOIN xyz USING (l_partkey)
        GROUP BY 1, 2""")),

    // ---- q286: change drill-down — the "why did revenue move"
    //      decomposition: split the order-date range in half, compute
    //      per-value revenue deltas along THREE candidate dimensions
    //      (brand, order priority, supplier nation), and report each
    //      dimension's explanatory shape — value count, Σ|Δ| (how
    //      concentrated the change is: Σ|Δ| ≥ |Δtotal| with equality
    //      iff every value moved the same direction), and the top
    //      mover with deterministic ties. All int64 cents; each
    //      dimension is one keyed aggregate + a 1-row TakeOrdered;
    //      the three 5-row summaries union. ----
    QueryDef(
      "q286_change_drilldown",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").select(col("o_orderkey"),
            col("o_orderdate"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier")
            .join(broadcast(t(s, d, "nation")),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("n_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("p_brand"), col("o_orderpriority"), col("n_name"),
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("dk"),
            round(col("l_extendedprice") * 100).cast("long").as("r"))
          // NOT spread before the persist: a dk-keyed repartition was
          // A/B-measured SLOWER in the same-window suite (2.91 →
          // 3.51 s at sf0.1) — the added exchange + 32-way cache write
          // cost more than the six single-partition aggregate passes
          // it parallelized. Reverted r13.
          .persist()
        val rng = li.agg(min(col("dk")).as("lo"), max(col("dk")).as("hi"))
        val halved = li.crossJoin(broadcast(rng))
          .withColumn("h",
            when(col("dk") * 2 <= col("lo") + col("hi"), 1L)
              .otherwise(2L))
        // r13 shape: the per-dimension branches each re-scanned the
        // cached build TWICE (summary + top-1 subtree), 6 full cache
        // passes plus rng's — melt the three dimension columns into
        // (dim, v) rows with ONE explode pass instead, so the cache is
        // read once for all three dimensions and the shared
        // groupBy(dim, v) Exchange is the ReusedExchange point for the
        // summary and top-1 branches. Same 3-row result (hash-exact vs
        // the unchanged per-dimension oracle); union of three
        // dimension plans → one melted plan.
        val per = halved
          .select(col("h"), col("r"), explode(array(
            struct(lit("brand").as("dim"), col("p_brand").as("v")),
            struct(lit("priority").as("dim"),
              col("o_orderpriority").as("v")),
            struct(lit("nation").as("dim"), col("n_name").as("v"))))
            .as("dv"))
          .select(col("dv.dim").as("dim"), col("dv.v").as("v"),
            col("h"), col("r"))
          .groupBy("dim", "v")
          .agg(sum(when(col("h") === 1, col("r")).otherwise(0L))
            .as("r1"),
            sum(when(col("h") === 2, col("r")).otherwise(0L))
              .as("r2"))
          .withColumn("delta", col("r2") - col("r1"))
        val summary = per.groupBy("dim")
          .agg(count(lit(1)).as("n_values"),
            sum(abs(col("delta"))).as("sum_abs_delta"))
        val top = per
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("dim")
              .orderBy(abs(col("delta")).desc, col("v"))))
          .filter(col("rk") === 1)
          .select(col("dim"), col("v").as("top_value"),
            col("delta").as("top_delta"))
        summary.join(broadcast(top), Seq("dim"))
          .select(col("dim"), col("n_values"), col("sum_abs_delta"),
            col("top_value"), col("top_delta"))
      },
      Some("""
        WITH li AS (
          SELECT p_brand, o_orderpriority, n_name,
            CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
              AS BIGINT) AS dk,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS r
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey),
        rng AS (SELECT MIN(dk) AS lo, MAX(dk) AS hi FROM li),
        hv AS (
          SELECT *, CASE WHEN dk * 2 <= lo + hi THEN 1 ELSE 2 END AS h
          FROM li, rng),
        pb AS (
          SELECT p_brand AS v,
            CAST(SUM(CASE WHEN h = 1 THEN r ELSE 0 END) AS BIGINT) r1,
            CAST(SUM(CASE WHEN h = 2 THEN r ELSE 0 END) AS BIGINT) r2
          FROM hv GROUP BY 1),
        pp AS (
          SELECT o_orderpriority AS v,
            CAST(SUM(CASE WHEN h = 1 THEN r ELSE 0 END) AS BIGINT) r1,
            CAST(SUM(CASE WHEN h = 2 THEN r ELSE 0 END) AS BIGINT) r2
          FROM hv GROUP BY 1),
        pn AS (
          SELECT n_name AS v,
            CAST(SUM(CASE WHEN h = 1 THEN r ELSE 0 END) AS BIGINT) r1,
            CAST(SUM(CASE WHEN h = 2 THEN r ELSE 0 END) AS BIGINT) r2
          FROM hv GROUP BY 1),
        mk AS (
          SELECT 'brand' AS dim, v, r2 - r1 AS delta FROM pb
          UNION ALL
          SELECT 'priority', v, r2 - r1 FROM pp
          UNION ALL
          SELECT 'nation', v, r2 - r1 FROM pn),
        su AS (
          SELECT dim, COUNT(*) AS n_values,
            CAST(SUM(abs(delta)) AS BIGINT) AS sum_abs_delta
          FROM mk GROUP BY 1),
        tp AS (
          SELECT dim, v AS top_value, delta AS top_delta
          FROM (SELECT dim, v, delta, ROW_NUMBER() OVER (
                  PARTITION BY dim
                  ORDER BY abs(delta) DESC, v) AS rk
                FROM mk)
          WHERE rk = 1)
        SELECT su.dim, n_values, sum_abs_delta, top_value, top_delta
        FROM su JOIN tp ON su.dim = tp.dim""")),

    // ---- q297: per-group top-k via the mergeable TopK Aggregator —
    //      the bounded-memory path where q63/q10's rank window ships
    //      EVERY row of every group through the exchange. The O(k)
    //      typed buffer combines map-side (ObjectHashAggregate
    //      partial/final — plan-asserted in TopKSpec along with
    //      window-parity on adversarial ties), so only ≤ k rows per
    //      group per partition are shuffled: at 100 TB the difference
    //      between moving the fact table and moving k·|groups| rows.
    //      Deterministic (value DESC, id ASC) order makes the result
    //      oracle-exact: DuckDB replays the same ORDER BY in a rank
    //      window. Top-5 spend events per event type. ----
    QueryDef(
      "q297_topk_aggregator",
      (s, d) =>
        t(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_type"), col("event_id"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
          .groupBy("event_type")
          .agg(graft.functions.TopK
            .topkLong(col("cents"), col("event_id"), 5).as("tk"))
          .select(col("event_type"), posexplode(col("tk")))
          .select(col("event_type"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col._1").as("cents"), col("col._2").as("event_id")),
      Some("""
        SELECT event_type, CAST(rk AS BIGINT) AS rank, cents, event_id
        FROM (
          SELECT event_type, event_id,
            CAST(floor("value" * 100) AS BIGINT) AS cents,
            row_number() OVER (PARTITION BY event_type
              ORDER BY CAST(floor("value" * 100) AS BIGINT) DESC,
                event_id) AS rk
          FROM events WHERE "value" IS NOT NULL)
        WHERE rk <= 5""")),

    // ---- q306: empirical removal-effect attribution — the
    //      counterfactual complement of q193's positional and q223's
    //      last-non-direct credit: for each touch channel, what
    //      fraction of converting users would NOT have converted-by-
    //      this-path if the channel were removed, i.e. how many
    //      converting paths CONTAIN it (a converting path without c
    //      survives c's removal). Per-user channel sets collapse to
    //      distinct (user, channel) pairs before the per-channel
    //      count — combinable, never a path explosion; the
    //      converting-user total rides a one-row broadcast. Exact
    //      integer counts + one shared division. ----
    QueryDef(
      "q306_removal_effect",
      (s, d) => {
        val ev = t(s, d, "events")
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        val tot = conv.agg(count(lit(1)).as("total_conv"))
        ev.filter(col("event_type") =!= "purchase")
          .join(conv, Seq("user_id"))
          .select(col("user_id"), col("event_type").as("channel"))
          .distinct()
          .groupBy("channel")
          .agg(count(lit(1)).as("conv_with"))
          .crossJoin(broadcast(tot))
          .withColumn("conv_without", col("total_conv") - col("conv_with"))
          .withColumn("removal_effect", expr(
            "CAST(conv_with AS DOUBLE) / CAST(total_conv AS DOUBLE)"))
      },
      Some("""
        WITH conv AS (
          SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase'),
        t AS (SELECT COUNT(*) AS total_conv FROM conv),
        pairs AS (
          SELECT DISTINCT e.user_id, e.event_type AS channel
          FROM events e JOIN conv USING (user_id)
          WHERE e.event_type <> 'purchase'),
        g AS (
          SELECT channel, COUNT(*) AS conv_with FROM pairs GROUP BY 1)
        SELECT channel, conv_with, total_conv,
          total_conv - conv_with AS conv_without,
          CAST(conv_with AS DOUBLE) / CAST(total_conv AS DOUBLE)
            AS removal_effect
        FROM g, t""")),

    // ---- q307: arc price elasticity, integer-exact — per part,
    //      consecutive-month (q, p) pairs scored with the midpoint
    //      formula ((q2−q1)/(q2+q1)) / ((p2−p1)/(p2+p1)). With
    //      integer quantities and cent-exact revenue sums the unit
    //      prices are rationals c_i/q_i, and cross-multiplying
    //      cancels the denominators: num = (q2−q1)·(c1·q2 + c2·q1),
    //      den = (q2+q1)·(c2·q1 − c1·q2) — both exact int64 (revenue
    //      cents ~1e7 × quantity ~1e3 × quantity-sum ~1e3 ≪ 2^63).
    //      The month pairing is consecutive-month matching on
    //      (part, mkey+1) — never a range join. Rows with den = 0
    //      (equal unit price) are excluded by stated semantics.
    //
    //      r13 shape: the original self-join of pm with itself
    //      planned the scan + two-level aggregate chain TWICE (the
    //      legs' pushed null filters differ — isnotnull(mkey) vs
    //      isnotnull(mkey−1) — so ReusedExchange cannot dedupe them)
    //      plus a BroadcastExchange of the second aggregated leg.
    //      Since (l_partkey, mkey) is unique after the groupBy, "the
    //      row with mkey+1" IS lead(1) over (partition l_partkey,
    //      order mkey) filtered to lead(mkey) = mkey+1 — one
    //      aggregate, one skinny window, guard filter proves
    //      equivalence (hash-exact vs the unchanged self-join
    //      oracle). Plan: two scans/aggregates + BroadcastHashJoin →
    //      one scan/aggregate + l_partkey Exchange + Window. ----
    QueryDef(
      "q307_arc_elasticity",
      (s, d) => {
        val pm = t(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("year(l_shipdate) * 12 + month(l_shipdate)").as("mkey"),
            expr("CAST(l_quantity AS BIGINT)").as("q"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
              .as("cents"))
          .groupBy("l_partkey", "mkey")
          .agg(sum(col("q")).as("q"), sum(col("cents")).as("c"))
        val w = Window.partitionBy("l_partkey").orderBy("mkey")
        pm.select(col("l_partkey"), col("mkey"),
            col("q").as("q1"), col("c").as("c1"),
            lead(col("mkey"), 1).over(w).as("mk2"),
            lead(col("q"), 1).over(w).as("q2"),
            lead(col("c"), 1).over(w).as("c2"))
          .filter(col("mk2") === col("mkey") + 1)
          .withColumn("num", expr("(q2 - q1) * (c1 * q2 + c2 * q1)"))
          .withColumn("den", expr("(q2 + q1) * (c2 * q1 - c1 * q2)"))
          .filter(col("den") =!= 0)
          .withColumn("elasticity",
            expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"))
          .select(col("l_partkey"), col("mkey"), col("q1"), col("q2"),
            col("c1"), col("c2"), col("num"), col("den"),
            col("elasticity"))
      },
      Some("""
        WITH pm AS (
          SELECT l_partkey,
            year(l_shipdate) * 12 + month(l_shipdate) AS mkey,
            CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
            CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS c
          FROM lineitem GROUP BY 1, 2)
        SELECT a.l_partkey, a.mkey, a.q AS q1, b.q AS q2,
          a.c AS c1, b.c AS c2,
          (b.q - a.q) * (a.c * b.q + b.c * a.q) AS num,
          (b.q + a.q) * (b.c * a.q - a.c * b.q) AS den,
          CAST((b.q - a.q) * (a.c * b.q + b.c * a.q) AS DOUBLE)
            / CAST((b.q + a.q) * (b.c * a.q - a.c * b.q) AS DOUBLE)
            AS elasticity
        FROM pm a JOIN pm b
          ON a.l_partkey = b.l_partkey AND b.mkey = a.mkey + 1
        WHERE (b.q + a.q) * (b.c * a.q - a.c * b.q) <> 0""")),

    // ---- q319: TOPSIS multi-criteria ranking (Hwang & Yoon 1981) —
    //      rank suppliers by closeness to the ideal point across
    //      three criteria at once (revenue ↑, order breadth ↑,
    //      return rate ↓): the multi-criteria decision table behind
    //      vendor scorecards, where a single-metric sort (q13) or a
    //      Pareto frontier (q206) can't give a total order. Exactness
    //      discipline: the three criteria are exact integers per
    //      supplier; vector-normalization denominators are corpus
    //      sqrt-of-sum-of-squares off ONE broadcast row; every
    //      distance/closeness double is the SAME fixed op chain
    //      (cast, /, ·, sqrt) from exact integers — bit-identical
    //      cross-engine, so even the final closeness ORDER matches.
    //      Ideal/anti-ideal points also ride the broadcast row
    //      (benefit criteria: max/min of exact integers scaled by
    //      the shared denominators). ----
    QueryDef(
      "q319_topsis_ranking",
      (s, d) => {
        val per = t(s, d, "lineitem")
          .groupBy("l_suppkey")
          .agg(
            expr("SUM(CAST(round(l_extendedprice * 100) AS BIGINT))" +
              " div 100").as("rev"),
            countDistinct(col("l_orderkey")).as("brd"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .as("ret"))
        val denoms = per.agg(
          sum(expr("rev * rev")).as("d_rev2"),
          sum(expr("brd * brd")).as("d_brd2"),
          sum(expr("ret * ret")).as("d_ret2"),
          max(col("rev")).as("rev_hi"), min(col("rev")).as("rev_lo"),
          max(col("brd")).as("brd_hi"), min(col("brd")).as("brd_lo"),
          max(col("ret")).as("ret_hi"), min(col("ret")).as("ret_lo"))
        // normalized coordinate: x / sqrt(Σx²); ideal = hi for benefit
        // criteria (rev, brd), lo for the cost criterion (ret)
        def nrm(x: String, d2: String) =
          s"CAST($x AS DOUBLE) / sqrt(CAST($d2 AS DOUBLE))"
        val dPos = "sqrt(" +
          s"(${nrm("rev", "d_rev2")} - ${nrm("rev_hi", "d_rev2")}) * " +
          s"(${nrm("rev", "d_rev2")} - ${nrm("rev_hi", "d_rev2")}) + " +
          s"(${nrm("brd", "d_brd2")} - ${nrm("brd_hi", "d_brd2")}) * " +
          s"(${nrm("brd", "d_brd2")} - ${nrm("brd_hi", "d_brd2")}) + " +
          s"(${nrm("ret", "d_ret2")} - ${nrm("ret_lo", "d_ret2")}) * " +
          s"(${nrm("ret", "d_ret2")} - ${nrm("ret_lo", "d_ret2")}))"
        val dNeg = "sqrt(" +
          s"(${nrm("rev", "d_rev2")} - ${nrm("rev_lo", "d_rev2")}) * " +
          s"(${nrm("rev", "d_rev2")} - ${nrm("rev_lo", "d_rev2")}) + " +
          s"(${nrm("brd", "d_brd2")} - ${nrm("brd_lo", "d_brd2")}) * " +
          s"(${nrm("brd", "d_brd2")} - ${nrm("brd_lo", "d_brd2")}) + " +
          s"(${nrm("ret", "d_ret2")} - ${nrm("ret_hi", "d_ret2")}) * " +
          s"(${nrm("ret", "d_ret2")} - ${nrm("ret_hi", "d_ret2")}))"
        per.crossJoin(broadcast(denoms))
          .withColumn("d_pos", expr(dPos))
          .withColumn("d_neg", expr(dNeg))
          .withColumn("closeness", expr("d_neg / (d_neg + d_pos)"))
          .orderBy(col("closeness").desc, col("l_suppkey"))
          .limit(20)
          .select("l_suppkey", "rev", "brd", "ret", "closeness")
      },
      Some("""
        WITH per AS (
          SELECT l_suppkey,
            CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) // 100 AS rev,
            CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS brd,
            CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS ret
          FROM lineitem GROUP BY 1),
        dn AS (
          SELECT CAST(SUM(rev * rev) AS BIGINT) AS d_rev2,
            CAST(SUM(brd * brd) AS BIGINT) AS d_brd2,
            CAST(SUM(ret * ret) AS BIGINT) AS d_ret2,
            MAX(rev) AS rev_hi, MIN(rev) AS rev_lo,
            MAX(brd) AS brd_hi, MIN(brd) AS brd_lo,
            MAX(ret) AS ret_hi, MIN(ret) AS ret_lo
          FROM per),
        sc AS (
          SELECT l_suppkey, rev, brd, ret,
            sqrt(
              (CAST(rev AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE))
                - CAST(rev_hi AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE)))
              * (CAST(rev AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE))
                - CAST(rev_hi AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE)))
              + (CAST(brd AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE))
                - CAST(brd_hi AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE)))
              * (CAST(brd AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE))
                - CAST(brd_hi AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE)))
              + (CAST(ret AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE))
                - CAST(ret_lo AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE)))
              * (CAST(ret AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE))
                - CAST(ret_lo AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE)))
            ) AS d_pos,
            sqrt(
              (CAST(rev AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE))
                - CAST(rev_lo AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE)))
              * (CAST(rev AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE))
                - CAST(rev_lo AS DOUBLE) / sqrt(CAST(d_rev2 AS DOUBLE)))
              + (CAST(brd AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE))
                - CAST(brd_lo AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE)))
              * (CAST(brd AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE))
                - CAST(brd_lo AS DOUBLE) / sqrt(CAST(d_brd2 AS DOUBLE)))
              + (CAST(ret AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE))
                - CAST(ret_hi AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE)))
              * (CAST(ret AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE))
                - CAST(ret_hi AS DOUBLE) / sqrt(CAST(d_ret2 AS DOUBLE)))
            ) AS d_neg
          FROM per, dn)
        SELECT l_suppkey, rev, brd, ret,
          d_neg / (d_neg + d_pos) AS closeness
        FROM sc
        ORDER BY closeness DESC, l_suppkey LIMIT 20""")),

    // ---- q320: header-vs-lines VALUE reconciliation — q130 audits
    //      key integrity, q134 diffs snapshots; this audits the
    //      cross-grain INVARIANT inside one snapshot: does each
    //      order's header total equal the sum of its lines'
    //      extendedprice? Line sums are cent-exact integers
    //      (round(x·100) — the parquet doubles are 2-decimal exact,
    //      so the cast is lossless and identical in both engines);
    //      the report buckets per-order diffs into matched / small /
    //      large drift with max-abs — a 6-integer summary row
    //      whatever the table size, off one join + two aggregates. ----
    QueryDef(
      "q320_header_line_reconcile",
      (s, d) => {
        val lines = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .as("line_cents"), count(lit(1)).as("n_lines"))
        t(s, d, "orders")
          .select(col("o_orderkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)")
              .as("hdr_cents"))
          .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
          .select(
            coalesce(col("line_cents"), lit(0L)).as("line_cents"),
            coalesce(col("n_lines"), lit(0L)).as("n_lines"),
            col("hdr_cents"))
          .withColumn("adiff", abs(col("hdr_cents") - col("line_cents")))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("n_lines") === 0, 1L).otherwise(0L))
              .as("n_lineless"),
            sum(when(col("adiff") === 0, 1L).otherwise(0L))
              .as("n_exact"),
            sum(when(col("adiff") > 0 && col("adiff") <= 100, 1L)
              .otherwise(0L)).as("n_small_drift"),
            sum(when(col("adiff") > 100, 1L).otherwise(0L))
              .as("n_large_drift"),
            max(col("adiff")).as("max_abs_diff_cents"))
      },
      Some("""
        WITH l AS (
          SELECT l_orderkey,
            CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS line_cents,
            COUNT(*) AS n_lines
          FROM lineitem GROUP BY 1),
        j AS (
          SELECT COALESCE(l.line_cents, 0) AS line_cents,
            COALESCE(l.n_lines, 0) AS n_lines,
            CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr_cents
          FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey),
        a AS (SELECT *, abs(hdr_cents - line_cents) AS adiff FROM j)
        SELECT COUNT(*) AS n_orders,
          CAST(SUM(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_lineless,
          CAST(SUM(CASE WHEN adiff = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_exact,
          CAST(SUM(CASE WHEN adiff > 0 AND adiff <= 100
            THEN 1 ELSE 0 END) AS BIGINT) AS n_small_drift,
          CAST(SUM(CASE WHEN adiff > 100 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_large_drift,
          MAX(adiff) AS max_abs_diff_cents
        FROM a""")),

    // ---- q329: retention triangle — the cohort DISTINCT-USER
    //      companion to q215's cohort-LTV (which rolls up revenue):
    //      users cohort on their first activity WEEK; cell (cohort,
    //      age) counts distinct users active age weeks later, plus
    //      retention in ppm of the cohort's size. The triangle is
    //      the standard growth-accounting artifact; as integers it
    //      is exactly reproducible cross-engine.
    //
    //      Scale shape: first-touch is one user-keyed min aggregate;
    //      activity dedupes to (user, week) before any join; the
    //      cohort join is user-keyed; the triangle aggregate is
    //      (cohort, age)-keyed — all combinable, no windows. ----
    QueryDef(
      "q329_retention_triangle",
      (s, d) => {
        val uw = t(s, d, "events")
          .select(col("user_id"),
            expr("ts div 604800000000").as("week"))
          .distinct()
        val first = uw.groupBy("user_id").agg(min(col("week")).as("cohort"))
        val sizes = first.groupBy("cohort")
          .agg(count(lit(1)).as("cohort_users"))
        uw.join(first, Seq("user_id"))
          .select(col("cohort"), (col("week") - col("cohort")).as("age"))
          .groupBy("cohort", "age")
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, Seq("cohort"))
          .withColumn("retention_ppm",
            expr("n_active * 1000000 div cohort_users"))
      },
      Some("""
        WITH uw AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
          FROM events),
        first AS (
          SELECT user_id, MIN(week) AS cohort FROM uw GROUP BY 1),
        sizes AS (
          SELECT cohort, COUNT(*) AS cohort_users FROM first GROUP BY 1),
        tri AS (
          SELECT f.cohort, uw.week - f.cohort AS age,
            COUNT(*) AS n_active
          FROM uw JOIN first f ON uw.user_id = f.user_id
          GROUP BY 1, 2)
        SELECT t.cohort, t.age, t.n_active, s.cohort_users,
          t.n_active * 1000000 // s.cohort_users AS retention_ppm
        FROM tri t JOIN sizes s ON t.cohort = s.cohort""")),

    // ---- q343: RFM segmentation — the classic customer-value cube:
    //      per user Recency (days since last purchase, relative to
    //      the corpus high-water day), Frequency (purchase count),
    //      Monetary (spend cents), each scored 1-5 against its own
    //      corpus-wide quintile cuts, rolled up per (r,f,m) segment.
    //      NO global window: the 4 cuts per metric ride a one-row
    //      broadcast (percentile_disc picks elements, so cuts are
    //      exact and `metric > cut` scoring is tie-stable on both
    //      engines); recency inverts so fresher = higher. ----
    QueryDef(
      "q343_rfm_segments",
      (s, d) => {
        val pur = t(s, d, "events")
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .select(col("user_id"), expr("ts div 86400000000").as("day"),
            round(col("value") * 100).cast("long").as("cents"))
        val user = pur.groupBy("user_id")
          .agg(max(col("day")).as("last_day"),
            count(lit(1)).as("f"), sum(col("cents")).as("m"))
        val hwm = user.agg(max(col("last_day")).as("hwm"))
        val rfm = user.crossJoin(broadcast(hwm))
          .select(col("user_id"), (col("hwm") - col("last_day")).as("r"),
            col("f"), col("m"))
          .persist() // cuts + scoring read it twice
        val cuts = rfm.agg(
          expr("array(percentile_disc(0.2) WITHIN GROUP (ORDER BY r)," +
            "percentile_disc(0.4) WITHIN GROUP (ORDER BY r)," +
            "percentile_disc(0.6) WITHIN GROUP (ORDER BY r)," +
            "percentile_disc(0.8) WITHIN GROUP (ORDER BY r))").as("rc"),
          expr("array(percentile_disc(0.2) WITHIN GROUP (ORDER BY f)," +
            "percentile_disc(0.4) WITHIN GROUP (ORDER BY f)," +
            "percentile_disc(0.6) WITHIN GROUP (ORDER BY f)," +
            "percentile_disc(0.8) WITHIN GROUP (ORDER BY f))").as("fc"),
          expr("array(percentile_disc(0.2) WITHIN GROUP (ORDER BY m)," +
            "percentile_disc(0.4) WITHIN GROUP (ORDER BY m)," +
            "percentile_disc(0.6) WITHIN GROUP (ORDER BY m)," +
            "percentile_disc(0.8) WITHIN GROUP (ORDER BY m))").as("mc"))
        def score(v: String, c: String) =
          expr(s"1 + size(filter($c, x -> $v > x))").cast("long")
        rfm.crossJoin(broadcast(cuts))
          .select(
            (lit(6L) - score("r", "rc")).as("r_score"),
            score("f", "fc").as("f_score"),
            score("m", "mc").as("m_score"),
            col("m"))
          .groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).as("n_users"), sum(col("m")).as("sum_m"))
      },
      Some("""
        WITH pur AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events
          WHERE event_type = 'purchase' AND "value" IS NOT NULL),
        u AS (
          SELECT user_id, MAX(day) AS last_day, COUNT(*) AS f,
            CAST(SUM(cents) AS BIGINT) AS m
          FROM pur GROUP BY 1),
        rfm AS (
          SELECT user_id, (SELECT MAX(last_day) FROM u) - last_day AS r,
            f, m
          FROM u),
        cuts AS (
          SELECT quantile_disc(r, [0.2, 0.4, 0.6, 0.8]) AS rc,
            quantile_disc(f, [0.2, 0.4, 0.6, 0.8]) AS fc,
            quantile_disc(m, [0.2, 0.4, 0.6, 0.8]) AS mc
          FROM rfm),
        scored AS (
          SELECT
            6 - (1 + len(list_filter(rc, x -> r > x))) AS r_score,
            1 + len(list_filter(fc, x -> f > x)) AS f_score,
            1 + len(list_filter(mc, x -> m > x)) AS m_score,
            m
          FROM rfm, cuts)
        SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
          CAST(SUM(m) AS BIGINT) AS sum_m
        FROM scored GROUP BY 1, 2, 3""")),

    // ---- q344: frequent 3-itemsets with lift — the next rung of
    //      the market-basket ladder above q268's pair lift: ordered
    //      triples of product FAMILIES (l_partkey % 997 — raw part
    //      triples go empty as the catalog outgrows basket sizes;
    //      the family grain keeps support meaningful at every SF,
    //      p1 < p2 < p3) co-purchased in ≥ 2 orders, with
    //      lift = P(abc) / (P(a)P(b)P(c)) telling real affinity from
    //      popularity. Enumeration is orientation-bounded exactly
    //      like q162's triangles — two equi-joins on l_orderkey with
    //      p1<p2<p3, so each basket of size k yields C(k,3) rows and
    //      the blow-up is bounded by basket size (~7 here), NEVER by
    //      catalog size. Supports are exact int64; lift is one
    //      mirrored double chain (c1·c2·c3 ≤ ~1e12 stays integral).
    //
    //      Scale shape: three order-keyed equi-joins over deduped
    //      skinny pairs + combinable counts; singleton supports ride
    //      a broadcast. ----
    QueryDef(
      "q344_triple_itemsets",
      (s, d) => {
        // derives its own family-grain base: consuming a shared
        // distinct-base artifact measured exactly neutral here (the
        // %997 projection forces its own distinct SHUFFLE either way —
        // see the Baskets scaladoc), so the extra artifact write was
        // pure overhead
        // conditional spread by l_orderkey off the single-task scan
        // (guide §2.4/§2.5): the distinct reuses this exchange
        // (clustering on a key subset), the three join legs join on
        // l_orderkey with NO further exchange, and the persisted cache
        // holds 32-way partitions instead of the scan's one —
        // previously all four passes over the cache ran single-core.
        // No-op on a many-file table (the gate).
        val li = graft.operators.InputSpread.byKey(
            t(s, d, "lineitem")
              .select(col("l_orderkey"),
                (col("l_partkey") % 997).as("l_partkey")),
            col("l_orderkey"))
          .distinct()
          .persist() // read 4x: three join legs + singleton supports
        val nOrders = li.select("l_orderkey").distinct().count()
        val single = li.groupBy("l_partkey")
          .agg(count(lit(1)).as("c1"))
        val a = li.select(col("l_orderkey"), col("l_partkey").as("p1"))
        val b = li.select(col("l_orderkey"), col("l_partkey").as("p2"))
        val c = li.select(col("l_orderkey"), col("l_partkey").as("p3"))
        val tri = a.join(b, Seq("l_orderkey"))
          .filter(col("p1") < col("p2"))
          .join(c, Seq("l_orderkey"))
          .filter(col("p2") < col("p3"))
          .groupBy("p1", "p2", "p3")
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 2)
        tri
          .join(broadcast(single.select(col("l_partkey").as("p1"),
            col("c1").as("s1"))), Seq("p1"))
          .join(broadcast(single.select(col("l_partkey").as("p2"),
            col("c1").as("s2"))), Seq("p2"))
          .join(broadcast(single.select(col("l_partkey").as("p3"),
            col("c1").as("s3"))), Seq("p3"))
          .select(col("p1"), col("p2"), col("p3"), col("cnt"),
            col("s1"), col("s2"), col("s3"),
            (((col("cnt").cast("double") * lit(nOrders.toDouble)) *
              lit(nOrders.toDouble)) /
              (col("s1") * col("s2") * col("s3")).cast("double"))
              .as("lift"))
      },
      Some("""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey % 997 AS l_partkey
          FROM lineitem),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
        s AS (SELECT l_partkey, COUNT(*) AS c1 FROM li GROUP BY 1),
        tri AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2,
            c.l_partkey AS p3, COUNT(*) AS cnt
          FROM li a
          JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          JOIN li c ON a.l_orderkey = c.l_orderkey
            AND b.l_partkey < c.l_partkey
          GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
        SELECT p1, p2, p3, cnt,
          s1.c1 AS s1, s2.c1 AS s2, s3.c1 AS s3,
          ((CAST(cnt AS DOUBLE) * CAST(n_orders AS DOUBLE))
              * CAST(n_orders AS DOUBLE))
            / CAST(s1.c1 * s2.c1 * s3.c1 AS DOUBLE) AS lift
        FROM tri
        JOIN s s1 ON tri.p1 = s1.l_partkey
        JOIN s s2 ON tri.p2 = s2.l_partkey
        JOIN s s3 ON tri.p3 = s3.l_partkey
        CROSS JOIN n""")),
  )
}
