package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t

/** Nested / array / semi-structured operators on `events` (SURVEY §2.11
  * X2-X5, §2.4 P2/P5): JSON extraction, collect→explode round trips,
  * array HOFs (`filter`, `aggregate`, `arrays_zip`), struct packing.
  *
  * These are batch analogues of the reference's history-array handling
  * (ref: bin/ztf/archive_index.py:186-264 zip+explode;
  * rubin/hbase_utils.py:1124-1141 aggregate/filter HOFs) expressed on the
  * driver's tables so each carries a DuckDB oracle.
  */
object Nested extends QueryPack {

  def defs: Seq[QueryDef] = Seq(
    // ---- P2/X4-style JSON field extraction + recode-aggregate ----
    QueryDef(
      "q27_json_extract",
      (s, d) =>
        t(s, d, "events")
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(
            sum(col("k")).as("sum_k"),
            count(col("k")).as("n")),
      Some("""
        SELECT event_type,
          CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
          count(json_extract_string(props, '$.k')) AS n
        FROM events GROUP BY 1""")),

    // ---- X1/X2/X3 analogue: per-user history arrays (collect sorted),
    //      zip two parallel arrays, explode back to rows with position.
    //      This is the concat_col → arrays_zip → explode spine of the
    //      reference's index tables, oracle-checked. ----
    QueryDef(
      "q28_zip_explode",
      (s, d) => {
        // histories sort on (µs ts, event_id) — the granularity the
        // oracle's scan sees (DuckDB truncates TIMESTAMP_NS to micros);
        // sorting on ns here would break sub-µs ties differently
        val hist = t(s, d, "events")
          .groupBy("user_id")
          .agg(
            array_sort(
              collect_list(struct(col("ts").as("ts_us"), col("event_id"), col("value"))))
              .as("h"))
          .select(
            col("user_id"),
            transform(col("h"), x => x.getField("event_id")).as("ids"),
            transform(col("h"), x => x.getField("value")).as("vals"))
        hist
          .select(
            col("user_id"),
            posexplode(arrays_zip(col("ids"), col("vals"))))
          .select(
            col("user_id"),
            (col("pos") + 1).cast("long").as("pos"),
            col("col.ids").as("event_id"),
            col("col.vals").as("value"))
      },
      Some("""
        WITH h AS (
          SELECT user_id,
            list(event_id ORDER BY ts, event_id) AS ids,
            list(value ORDER BY ts, event_id) AS vals
          FROM events GROUP BY user_id)
        SELECT user_id,
          unnest(range(1, len(ids) + 1)) AS pos,
          unnest(ids) AS event_id,
          unnest(vals) AS value
        FROM h""")),

    // ---- X5/A5 analogue: HOF filter + aggregate over per-user arrays:
    //      count of high-value events and running total via fold ----
    QueryDef(
      "q29_array_hof",
      (s, d) =>
        t(s, d, "events")
          .groupBy("user_id")
          .agg(
            array_sort(collect_list(struct(col("ts").as("ts_us"), col("event_id"), col("value"))))
              .as("h"))
          .select(
            col("user_id"),
            size(filter(col("h"), x => x.getField("value") > 100))
              .cast("long").as("n_high"),
            aggregate(
              col("h"),
              lit(0.0),
              (acc, x) => acc + x.getField("value")).as("total"),
            aggregate(
              col("h"),
              lit(Double.NegativeInfinity),
              (acc, x) => greatest(acc, x.getField("value"))).as("vmax")),
      Some("""
        WITH h AS (
          SELECT user_id, list(value ORDER BY ts, event_id) AS vals
          FROM events GROUP BY user_id)
        SELECT user_id,
          len(list_filter(vals, v -> v > 100)) AS n_high,
          list_aggregate(vals, 'sum') AS total,
          list_aggregate(vals, 'max') AS vmax
        FROM h""")),

    // ---- P5/P7 struct packing + row-key synthesis (ref:
    //      common/hbase_utils.py:271-342 concat_ws row keys;
    //      rubin/science.py:434-444 struct packing) ----
    QueryDef(
      "q30_rowkey_struct",
      (s, d) =>
        t(s, d, "events")
          .select(
            concat_ws("_", col("user_id"), col("event_type"), col("event_id"))
              .as("row_key"),
            col("event_id"),
            col("user_id"),
            col("event_type"),
            col("value"))
          .withColumn("packed_value", col("value") * 2 - 1)
          .drop("value"),
      Some("""
        SELECT user_id || '_' || event_type || '_' || event_id AS row_key,
          event_id, user_id, event_type,
          value * 2 - 1 AS packed_value
        FROM events""")),

    // ---- J4 proper: the reference's monthly SSO aggregation merge
    //      (ref: bin/ztf/compute_ephemerides.py:247-252 via fink_utils
    //      join_aggregated_sso_data): two per-object aggregated tables
    //      (previous month + new month) full-outer-joined on the object
    //      key, each per-object history ARRAY merged by concatenation
    //      (prev entries first), counts added. The merged arrays are
    //      position-exploded so the oracle checks order value-for-value.
    //      Scale shape: one partial-aggregated shuffle per side, one
    //      keyed outer join — never a row-level union of raw history. ----
    QueryDef(
      "q44_sso_merge",
      (s, d) => {
        val events = t(s, d, "events")
        def monthAgg(parity: Int) = events
          .filter(col("event_id") % 2 === parity)
          .groupBy("user_id")
          .agg(array_sort(
            collect_list(struct(col("ts").as("ts_us"), col("event_id"), col("value"))))
            .as("h"))
          .select(
            col("user_id"),
            transform(col("h"), x => x.getField("value")).as("vals"),
            size(col("h")).cast("long").as("n"))
        val prev = monthAgg(0)
        val brand = monthAgg(1)
        val empty = array().cast("array<double>")
        val merged = prev.as("p")
          .join(brand.as("n"), Seq("user_id"), "full_outer")
          .select(
            col("user_id"),
            concat(
              coalesce(col("p.vals"), empty),
              coalesce(col("n.vals"), empty)).as("cvalue"),
            (coalesce(col("p.n"), lit(0L)) + coalesce(col("n.n"), lit(0L)))
              .as("nobs"))
        merged
          .select(col("user_id"), col("nobs"), posexplode(col("cvalue")))
          .select(
            col("user_id"),
            col("nobs"),
            (col("pos") + 1).cast("long").as("pos"),
            col("col").as("value"))
      },
      Some("""
        WITH prev AS (
          SELECT user_id, list(value ORDER BY ts, event_id) AS vals,
                 count(*) AS n
          FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
        brand AS (
          SELECT user_id, list(value ORDER BY ts, event_id) AS vals,
                 count(*) AS n
          FROM events WHERE event_id % 2 = 1 GROUP BY user_id),
        merged AS (
          SELECT COALESCE(p.user_id, b.user_id) AS user_id,
            list_concat(COALESCE(p.vals, []), COALESCE(b.vals, [])) AS cvalue,
            CAST(COALESCE(p.n, 0) + COALESCE(b.n, 0) AS BIGINT) AS nobs
          FROM prev p FULL OUTER JOIN brand b ON p.user_id = b.user_id)
        SELECT user_id, nobs,
          CAST(unnest(range(1, len(cvalue) + 1)) AS BIGINT) AS pos,
          unnest(cvalue) AS value
        FROM merged""")),

    // ---- q310: VariantType extraction — the Spark 4 semi-structured
    //      path (q27 is the classic string-walking get_json_object):
    //      `parse_json` decodes each props payload ONCE into the
    //      binary variant encoding, then `variant_get` navigates it
    //      with a typed path — the shredding-friendly representation
    //      a 100 TB pipeline wants when many fields are read from one
    //      JSON column (parse once, extract N times, no re-tokenizing
    //      per field). The variant itself never reaches the output
    //      (aggregated away — driver compare is primitive-only);
    //      invalid-path rows surface as NULLs via try_variant_get and
    //      are counted. Oracle: DuckDB's native JSON extraction. ----
    QueryDef(
      "q310_variant_extract",
      (s, d) =>
        t(s, d, "events")
          .withColumn("v", expr("parse_json(props)"))
          .select(col("event_type"),
            expr("try_variant_get(v, '$.k', 'long')").as("k"),
            expr("try_variant_get(v, '$.missing', 'long')").as("miss"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("k")).as("n_k"),
            count(col("miss")).as("n_miss"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k")),
      Some("""
        SELECT event_type, COUNT(*) AS n,
          COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_k,
          COUNT(CAST(props->>'$.missing' AS BIGINT)) AS n_miss,
          CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
          MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
          MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
        FROM events GROUP BY 1""")),

    // ---- q321: schema-directed from_json with a malformed-payload
    //      quarantine — the ingestion-side complement of q310's
    //      schemaless Variant path. Every 13th payload is truncated
    //      (losing its closing brace), so the strict-schema parse
    //      must return NULL for exactly those rows: `n_bad` counts
    //      the quarantine, `sum_k` proves the surviving rows parsed
    //      to the right values. This is the E1-style PERMISSIVE
    //      decode-or-quarantine contract on the JSON wire format
    //      (the Avro path tests it with corrupt Avro payloads).
    //
    //      Scale shape: parse + validity test are per-row codegen'd
    //      expressions; the only exchange is the 5-key event_type
    //      aggregate (combinable counts/sums). ----
    QueryDef(
      "q321_from_json_quarantine",
      (s, d) => {
        val js = when(col("event_id") % 13 === 0,
          expr("substring(props, 1, length(props) - 2)"))
          .otherwise(col("props"))
        t(s, d, "events")
          .select(col("event_type"),
            from_json(js, StructType(Seq(StructField("k", LongType))))
              .as("p"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("p.k")).as("n_parsed"),
            (count(lit(1)) - count(col("p.k"))).as("n_bad"),
            sum(col("p.k")).as("sum_k"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type,
            CASE WHEN event_id % 13 = 0
              THEN substring(props, 1, length(props) - 2)
              ELSE props END AS js
          FROM events),
        p AS (
          SELECT event_type,
            CASE WHEN json_valid(js)
              THEN CAST(json_extract(js, '$.k') AS BIGINT) END AS k
          FROM ev)
        SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_parsed,
          COUNT(*) - COUNT(k) AS n_bad,
          CAST(SUM(k) AS BIGINT) AS sum_k
        FROM p GROUP BY 1""")),

    // ---- q337: map higher-order functions — the map-typed half of
    //      the collections surface (arrays have X1-X5): per user,
    //      build event_type→count and event_type→spend maps with
    //      map_from_entries, align them with map_zip_with, gate
    //      entries with map_filter (n ≥ 5), derive integer
    //      avg-cents-per-event with transform_values, and explode
    //      back to rows. The oracle computes the SAME result
    //      relationally (GROUP BY + HAVING + integer division), so
    //      hash equality proves the map algebra — build, zip,
    //      filter, transform, explode — is lossless against the
    //      relational form.
    //
    //      Scale shape: one (user, type) aggregate, then one
    //      user-keyed collect into maps bounded by |event types| = 5
    //      entries; per-row HOFs; no window, no skew. ----
    QueryDef(
      "q337_map_hofs",
      (s, d) => {
        val per = t(s, d, "events").filter(col("value").isNotNull)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("spend"))
        per.groupBy("user_id")
          .agg(
            map_from_entries(collect_list(struct(col("event_type"),
              col("n")))).as("m_n"),
            map_from_entries(collect_list(struct(col("event_type"),
              col("spend")))).as("m_s"))
          .withColumn("m",
            expr("""map_filter(
              map_zip_with(m_n, m_s, (k, a, b) -> struct(a AS n, b AS s)),
              (k, v) -> v.n >= 5)"""))
          .withColumn("m2",
            expr("transform_values(m, (k, v) -> " +
              "struct(v.n AS n, v.s AS s, v.s div v.n AS avg_cents))"))
          .select(col("user_id"), explode(col("m2")))
          .select(col("user_id"), col("key").as("event_type"),
            col("value.n").as("n"), col("value.s").as("spend_cents"),
            col("value.avg_cents").as("avg_cents"))
      },
      Some("""
        SELECT user_id, event_type, COUNT(*) AS n,
          CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
            AS spend_cents,
          CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
            // COUNT(*) AS avg_cents
        FROM events WHERE "value" IS NOT NULL
        GROUP BY 1, 2 HAVING COUNT(*) >= 5""")),

    // ---- q338: schema-directed from_xml with a malformed-payload
    //      quarantine — Spark 4's native XML surface, rounding out
    //      the wire formats (Avro E1, JSON q321/q310, CSV/JSONL
    //      source specs, XML here + XmlSourceSpec). Every 13th
    //      payload loses its closing tag, so the strict-schema parse
    //      must NULL exactly those rows; DuckDB has no XML, so the
    //      oracle derives the expected outcome from the original
    //      columns plus the same %13 corruption rule — hash equality
    //      proves the parser path is the identity on well-formed
    //      payloads and quarantines precisely the broken ones.
    //
    //      Scale shape: per-row build + parse expressions, one 3-key
    //      status aggregate. ----
    QueryDef(
      "q338_from_xml_quarantine",
      (s, d) => {
        val xml = concat(lit("<o><id>"), col("o_orderkey"),
          lit("</id><st>"), col("o_orderstatus"), lit("</st></o>"))
        val js = when(col("o_orderkey") % 13 === 0,
          expr("substring(xml_s, 1, length(xml_s) - 2)"))
          .otherwise(col("xml_s"))
        t(s, d, "orders")
          .withColumn("xml_s", xml)
          .select(col("o_orderstatus"),
            from_xml(js, StructType(Seq(
              StructField("id", LongType),
              StructField("st", StringType)))).as("p"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            count(col("p.id")).as("n_parsed"),
            (count(lit(1)) - count(col("p.id"))).as("n_bad"),
            sum(col("p.id")).as("sum_id"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN 0 ELSE 1 END)
            AS BIGINT) AS n_parsed,
          CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bad,
          CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN NULL
            ELSE o_orderkey END) AS BIGINT) AS sum_id
        FROM orders GROUP BY 1""")))
}
