package graft.queries

import org.apache.spark.sql.functions._

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
        val hist = t(s, d, "events")
          .groupBy("user_id")
          .agg(
            array_sort(
              collect_list(struct(col("ts"), col("event_id"), col("value"))))
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
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("value"))))
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
        FROM events""")))
}
