package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.{sumDec, t}

/** Extended relational surface: string/math/date scalar functions,
  * null gates, multi-set unions, rollup, pivot-style conditional
  * aggregation, lead/lag windows — each chosen to be bit-exact across
  * Spark and DuckDB (no round(), no raw double sums, ties always
  * broken).
  */
object Extended extends QueryPack {

  def defs: Seq[QueryDef] = Seq(
    // ---- X7 string functions ----
    QueryDef(
      "q32_string_funcs",
      (s, d) =>
        t(s, d, "customer")
          .select(
            col("c_custkey"),
            lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
            substring(col("c_name"), 1, 8).as("prefix"),
            concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
            col("c_name").startsWith("Customer").cast("boolean").as("is_cust"),
            upper(col("c_mktsegment")).as("seg_upper"),
            length(col("c_name")).cast("long").as("name_len")),
      Some("""
        SELECT c_custkey,
          lpad(c_custkey::VARCHAR, 8, '0') AS padded,
          substring(c_name, 1, 8) AS prefix,
          concat_ws('|', c_mktsegment, c_name) AS joined,
          starts_with(c_name, 'Customer') AS is_cust,
          upper(c_mktsegment) AS seg_upper,
          length(c_name) AS name_len
        FROM customer""")),

    // ---- X8 math functions (IEEE-exact per-row ops only) ----
    QueryDef(
      "q33_math_funcs",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") > 0)
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            // log10/pow are libm-dependent (JVM vs the oracle's libm can
            // differ by 1 ulp — measured for ln() in q82's notes), so
            // their hash-compared forms round through float32: a 1-ulp
            // double difference vanishes in the float rounding. abs/
            // floor/ceil/sqrt are IEEE-exact and compare at full width.
            log10(col("l_quantity")).cast("float").as("log_qty"),
            abs(col("l_discount") - 0.05).as("abs_disc"),
            pow(col("l_quantity"), 2).cast("float").as("qty_sq"),
            floor(col("l_extendedprice")).cast("long").as("price_floor"),
            ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
            sqrt(col("l_quantity")).as("qty_sqrt")),
      Some("""
        SELECT l_orderkey, l_linenumber,
          log10(l_quantity)::FLOAT AS log_qty,
          abs(l_discount - 0.05) AS abs_disc,
          pow(l_quantity, 2)::FLOAT AS qty_sq,
          floor(l_extendedprice)::BIGINT AS price_floor,
          ceil(l_extendedprice)::BIGINT AS price_ceil,
          sqrt(l_quantity) AS qty_sqrt
        FROM lineitem WHERE l_quantity > 0""")),

    // ---- X9 date functions ----
    QueryDef(
      "q34_date_funcs",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy").as("y"),
            date_format(col("o_orderdate"), "MM").as("m"),
            date_format(col("o_orderdate"), "dd").as("dd"),
            year(col("o_orderdate")).cast("long").as("y_num"),
            month(col("o_orderdate")).cast("long").as("m_num"),
            dayofmonth(col("o_orderdate")).cast("long").as("d_num")),
      Some("""
        SELECT o_orderkey,
          strftime(o_orderdate, '%Y') AS y,
          strftime(o_orderdate, '%m') AS m,
          strftime(o_orderdate, '%d') AS dd,
          year(o_orderdate) AS y_num,
          month(o_orderdate) AS m_num,
          day(o_orderdate) AS d_num
        FROM orders""")),

    // ---- F5 null gates over a synthesized nullable column ----
    QueryDef(
      "q35_null_gates",
      (s, d) =>
        t(s, d, "lineitem")
          .withColumn("maybe",
            when(col("l_orderkey") % 7 === 0, lit(null).cast("double"))
              .otherwise(col("l_quantity")))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("maybe")).as("n_notnull"),
            sum(col("maybe").isNull.cast("long")).as("n_null"),
            sumDec(coalesce(col("maybe"), lit(0.0))).as("sum_notnull")),
      Some("""
        SELECT count(*) AS n_rows,
          count(maybe) AS n_notnull,
          CAST(sum(CASE WHEN maybe IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          CAST(SUM(CAST(coalesce(maybe, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_notnull
        FROM (SELECT CASE WHEN l_orderkey % 7 = 0 THEN NULL
                          ELSE l_quantity END AS maybe FROM lineitem)""")),

    // ---- D3 multi-branch union (multi-day load shape) ----
    QueryDef(
      "q36_union_branches",
      (s, d) => {
        val o = t(s, d, "orders")
        o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), lit("finished").as("branch"))
          .union(
            o.filter(col("o_orderstatus") === "O" && col("o_totalprice") > 200000)
              .select(col("o_orderkey"), lit("open_big").as("branch")))
      },
      Some("""
        SELECT o_orderkey, 'finished' AS branch FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, 'open_big' AS branch FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice > 200000""")),

    // ---- Rollup (hierarchical totals; rolled-up keys coalesced to a
    //      sentinel so the output is null-free for the hash compare) ----
    QueryDef(
      "q37_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            sumDec(col("l_quantity")).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
            col("n"), col("qty")),
      Some("""
        SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
          coalesce(l_linestatus, '(all)') AS l_linestatus,
          count(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // ---- Pivot as conditional aggregation (engine-portable form) ----
    QueryDef(
      "q38_pivot_case",
      (s, d) =>
        t(s, d, "events")
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error")),
      Some("""
        SELECT user_id,
          CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
          CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        FROM events GROUP BY user_id""")),

    // ---- Approximate sketches — the 100 TB substitutes for exact
    //      distinct/quantile (HLL++ / Greenwald-Khanna; deterministic
    //      for fixed input, no DuckDB oracle → rows-only + SketchSpec
    //      error-bound assertions vs exact).
    //      DOCUMENTED rows-only: the sketch VALUES are artifacts of
    //      Spark's HLL++ register layout / GK compression — no other
    //      engine reproduces them bit-for-bit, so a value oracle is
    //      impossible by construction; the correctness claim is the
    //      error bound vs exact, which SketchSpec asserts. ----
    QueryDef(
      "q41_sketches",
      (s, d) =>
        t(s, d, "lineitem")
          .agg(
            approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
            approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("approx_supps"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
              .as("approx_median_price"),
            percentile_approx(col("l_quantity"), lit(0.95), lit(10000))
              .as("approx_p95_qty")),
      None),

    // ---- lead/lag/first-value windows (tie-broken ordering) ----
    QueryDef(
      "q39_lead_lag",
      (s, d) => {
        // order at µs like the oracle scan sees (q09 note): a ns-side
        // order would break sub-µs ties differently than DuckDB's
        // (µs, event_id) order; event_id is unique so this stays total
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        // partition-edge nulls coalesced to -1/0 so the output is
        // null-free for the hash compare
        t(s, d, "events")
          .select(
            col("user_id"),
            col("event_id"),
            coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_event"),
            coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_event"),
            first(col("event_id")).over(w).as("first_event"),
            // µs resolution: DuckDB truncates the TIMESTAMP_NS parquet
            // column to micros at scan (see q09 note)
            coalesce(
              col("ts") - lag(col("ts"), 1).over(w),
              lit(0L)).as("us_since_prev"))
      },
      Some("""
        SELECT user_id, event_id,
          coalesce(lag(event_id, 1) OVER w, -1) AS prev_event,
          coalesce(lead(event_id, 1) OVER w, -1) AS next_event,
          first_value(event_id) OVER w AS first_event,
          coalesce(epoch_us(ts) - lag(epoch_us(ts), 1) OVER w, 0) AS us_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""")),

    // ---- grouped string aggregation (listagg): collect + canonical
    //      order + join, the string form of collect_list. Ordering is
    //      made total (names are unique per group) so both engines
    //      concatenate identically. ----
    QueryDef(
      "q56_string_agg",
      (s, d) =>
        t(s, d, "customer")
          .groupBy(col("c_nationkey"))
          .agg(
            count(lit(1)).as("n"),
            array_join(array_sort(collect_list(col("c_name"))), ",")
              .as("names")),
      Some("""
        SELECT c_nationkey, COUNT(*) AS n,
          string_agg(c_name, ',' ORDER BY c_name) AS names
        FROM customer GROUP BY c_nationkey""")),

    // ---- RANGE-frame window: 10-minute trailing aggregate per user.
    //      ROWS frames (q11/q39) count physical rows; a RANGE frame is
    //      bounded by the ORDER-BY VALUE, so ties are all-in and the
    //      result is deterministic under any row order — the form
    //      sliding event-time analytics need. ----
    QueryDef(
      "q62_range_frame",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
          .rangeBetween(-600000000L, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            col("ts").as("ts_us"))
          .withColumn("n_10min", count(lit(1)).over(w))
          .withColumn("sum_ids_10min", sum(col("event_id")).over(w))
      },
      Some("""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          COUNT(*) OVER w AS n_10min,
          CAST(SUM(event_id) OVER w AS BIGINT) AS sum_ids_10min
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""")),

    // ---- relational PIVOT operator proper (q38 is the CASE-expansion
    //      form; this is `RelationalGroupedDataset.pivot` with pinned
    //      values — pinning skips Spark's extra distinct-values job and
    //      keeps the output schema static, the 100 TB-safe form) ----
    QueryDef(
      "q58_pivot",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sumDec(col("l_quantity")))
          .select(col("l_linestatus"),
            col("A").as("qty_a"), col("N").as("qty_n"),
            col("R").as("qty_r")),
      Some("""
        SELECT l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (l_returnflag = 'A') AS DOUBLE) AS qty_a,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (l_returnflag = 'N') AS DOUBLE) AS qty_n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (l_returnflag = 'R') AS DOUBLE) AS qty_r
        FROM lineitem GROUP BY l_linestatus""")),

    // ---- UNPIVOT (q58's inverse): wide per-flag aggregates melt into
    //      (key, metric, value) long form via the `stack` generator —
    //      the shape metric stores and plotting layers want. stack is
    //      a per-row generator (no join, no shuffle beyond the
    //      aggregate that feeds it); every value is exact-in-double
    //      (decimal sums cast once, counts exactly representable).
    //      The oracle mirrors with UNION ALL — semantically what
    //      UNPIVOT/stack expands to. ----
    QueryDef(
      "q120_unpivot",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(sumDec(col("l_quantity")).as("sum_qty"),
            sumDec(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).cast("double").as("n_items"))
          .selectExpr("l_returnflag",
            "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price," +
              " 'n_items', n_items) AS (metric, value)"),
      Some("""
        WITH wide AS (
          SELECT l_returnflag,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_price,
            CAST(COUNT(*) AS DOUBLE) AS n_items
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value
          FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL
        SELECT l_returnflag, 'n_items', n_items FROM wide""")),

    // ---- the complete ranking-function family in one window pass:
    //      rank/dense_rank/percent_rank/cume_dist are TIE-INVARIANT
    //      over the value ordering (identical cross-engine without a
    //      tiebreak); first/nth_value use the fully tie-broken order
    //      (quantity, orderkey, linenumber) over the full frame, so
    //      the picked elements are unique. ONE partition exchange
    //      feeds both sorts. percent_rank and cume_dist are
    //      (exact int)/(exact int) — IEEE-identical. ----
    QueryDef(
      "q121_rank_family",
      (s, d) => {
        val byVal = Window.partitionBy("l_returnflag")
          .orderBy(col("l_quantity"))
        val full = Window.partitionBy("l_returnflag")
          .orderBy(col("l_quantity"), col("l_orderkey"),
            col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)
        t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"))
          .withColumn("rnk", rank().over(byVal).cast("long"))
          .withColumn("drnk", dense_rank().over(byVal).cast("long"))
          .withColumn("prnk", percent_rank().over(byVal))
          .withColumn("cdist", cume_dist().over(byVal))
          .withColumn("first_q", first(col("l_quantity")).over(full))
          .withColumn("third_q",
            nth_value(col("l_quantity"), 3).over(full))
      },
      Some("""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
          CAST(rank() OVER v AS BIGINT) AS rnk,
          CAST(dense_rank() OVER v AS BIGINT) AS drnk,
          percent_rank() OVER v AS prnk,
          cume_dist() OVER v AS cdist,
          first_value(l_quantity) OVER f AS first_q,
          nth_value(l_quantity, 3) OVER f AS third_q
        FROM lineitem
        WINDOW v AS (PARTITION BY l_returnflag ORDER BY l_quantity),
          f AS (PARTITION BY l_returnflag
            ORDER BY l_quantity, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")),

    // ---- bitwise aggregates: per-user event-type membership masks —
    //      the compact "which of K categories did this key touch" set
    //      encoding (bit_or fold), its popcount cardinality, and a
    //      bit_xor checksum of event ids (order-free by XOR's
    //      commutativity, so cross-engine exact). The type→bit map is
    //      computed IN-QUERY (alphabetical position in a collect_set →
    //      sort_array vocabulary fold) and broadcast back — no
    //      hardcoded vocab, and no unpartitioned WindowExec: the
    //      vocabulary is ONE combinable aggregate row (partials bounded
    //      by the category cardinality K), posexploded to (bit, type).
    //      Bounded by construction: >64 types would silently overflow
    //      the mask, so the plan raise_error()s instead — the bound the
    //      mask encoding itself assumes, now enforced in-plan.
    //      Scale: distinct-types is a tiny combinable aggregate; the
    //      mask fold is map-side combinable; one user-keyed shuffle. ----
    QueryDef(
      "q122_bitwise_agg",
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"))
        val bits = e
          .agg(sort_array(collect_set(col("event_type"))).as("types"))
          .select(posexplode(
            when(size(col("types")) <= 64, col("types"))
              .otherwise(raise_error(lit(
                "q122: >64 distinct event types — 64-bit mask overflow")))))
          .select(col("col").as("event_type"),
            col("pos").cast("long").as("bit"))
        e.join(broadcast(bits), Seq("event_type"))
          .groupBy("user_id")
          .agg(
            bit_or(expr("shiftleft(1L, int(bit))")).as("type_mask"),
            bit_xor(col("event_id")).as("xor_event_ids"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("type_mask"),
            bit_count(col("type_mask")).cast("long").as("n_types"),
            col("xor_event_ids"), col("n_events"))
      },
      Some("""
        WITH bits AS (
          SELECT event_type,
            CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) - 1
              AS bit
          FROM (SELECT DISTINCT event_type FROM events)),
        j AS (
          SELECT e.user_id, e.event_id, b.bit
          FROM events e JOIN bits b USING (event_type))
        SELECT user_id,
          CAST(bit_or(1::BIGINT << CAST(bit AS INT)) AS BIGINT)
            AS type_mask,
          CAST(bit_count(bit_or(1::BIGINT << CAST(bit AS INT)))
            AS BIGINT) AS n_types,
          CAST(bit_xor(event_id) AS BIGINT) AS xor_event_ids,
          COUNT(*) AS n_events
        FROM j GROUP BY user_id""")),

    // ---- q151: grouped MODE with an EXPLICIT tie policy. Engines'
    //      built-in mode() leaves ties unspecified (DuckDB picks
    //      "first", Spark 4's mode() is non-deterministic on ties), so
    //      the portable form is the count + rank idiom both engines
    //      run identically: highest count wins, smallest value breaks
    //      ties. One keyed count + a group-partitioned rank window
    //      over the (group, value) table — vocabulary-sized input, not
    //      row-sized. ----
    QueryDef(
      "q151_grouped_mode",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = t(s, d, "lineitem")
          .groupBy(col("l_returnflag"),
            col("l_quantity").cast("decimal(18,2)").as("q"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("n").desc, col("q").asc)
        counts.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("l_returnflag"),
            col("q").cast("double").as("mode_quantity"),
            col("n").as("mode_count"))
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS q,
            COUNT(*) AS n
          FROM lineitem GROUP BY 1, 2),
        rk AS (
          SELECT *, row_number() OVER (PARTITION BY l_returnflag
            ORDER BY n DESC, q ASC) AS rk
          FROM c)
        SELECT l_returnflag, CAST(q AS DOUBLE) AS mode_quantity,
          n AS mode_count
        FROM rk WHERE rk = 1""")),

    // ---- q152: period-over-period growth — the BI staple: daily
    //      event counts per type with previous-day lag, absolute
    //      delta, and growth in ppm (integer division; a float pct
    //      would be one more exact-operand division, but ppm keeps
    //      the whole row integer). Day gaps are real gaps (lag is
    //      over the observed series; q119's grid fill is the
    //      densify-first alternative). One keyed count + one lag
    //      window over the (type, day) series — time-bounded. ----
    QueryDef(
      "q152_growth",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), expr("ts div 86400000000").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.withColumn("prev_n", lag(col("n"), 1).over(w))
          .select(col("event_type"), col("day"), col("n"), col("prev_n"),
            (col("n") - col("prev_n")).as("delta"),
            when(col("prev_n").isNotNull,
              expr("(n - prev_n) * 1000000 div prev_n")).as("growth_ppm"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        l AS (
          SELECT *, lag(n, 1) OVER (PARTITION BY event_type
            ORDER BY day) AS prev_n
          FROM daily)
        SELECT event_type, day, n, prev_n, n - prev_n AS delta,
          CASE WHEN prev_n IS NOT NULL
            THEN (n - prev_n) * 1000000 // prev_n END AS growth_ppm
        FROM l""")),

    // ---- q168: rank / dense_rank by VALUE LEVEL — the rank-transform
    //      normalization done the scale-safe way: aggregate to the
    //      distinct (group, value) domain FIRST (map-side combinable),
    //      then run the window over value levels, not rows (the q61
    //      distinct-domain discipline). rank(level) = running count of
    //      lower rows + 1; dense_rank(level) = row_number over levels;
    //      exact integer percent-rank numerator (rank − 1) against
    //      denominator (n_group − 1) — consumers divide at their own
    //      precision. A 100 TB column with a bounded value domain
    //      windows over thousands of levels instead of trillions of
    //      rows. ----
    QueryDef(
      "q168_rank_levels",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lvl = t(s, d, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
          .filter(col("cents").isNotNull)
          .groupBy("event_type", "cents")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("event_type").orderBy("cents")
        val tot = lvl.groupBy("event_type").agg(sum("cnt").as("n_group"))
        lvl
          .withColumn("cum", sum(col("cnt"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("rk", col("cum") - col("cnt") + 1)
          .withColumn("drk", row_number().over(w).cast("long"))
          .join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("cents"), col("cnt"),
            col("rk"), col("drk"),
            (col("rk") - 1).as("pct_num"),
            (col("n_group") - 1).as("pct_den"))
      },
      Some("""
        WITH lvl AS (
          SELECT event_type,
            CAST(round("value" * 100) AS BIGINT) AS cents,
            COUNT(*) AS cnt
          FROM events WHERE "value" IS NOT NULL
          GROUP BY 1, 2),
        wn AS (
          SELECT event_type, cents, cnt,
            CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY cents) AS BIGINT) AS drk
          FROM lvl),
        tot AS (
          SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_group
          FROM lvl GROUP BY 1)
        SELECT w.event_type, w.cents, w.cnt,
          w.cum - w.cnt + 1 AS rk, w.drk,
          w.cum - w.cnt AS pct_num,
          t.n_group - 1 AS pct_den
        FROM wn w JOIN tot t USING (event_type)""")),

    // ---- q173: date-spine densification — gap filling for time
    //      series: generate the full [min_day, max_day] day spine per
    //      type (sequence explode — |types|·|days| rows, never a
    //      cartesian against the fact table), left-join the daily
    //      counts, zero-fill, and flag the gaps. The op every
    //      dashboard and forecasting pipeline needs before windowed
    //      math. ----
    QueryDef(
      "q173_date_spine",
      (s, d) => {
        val daily = t(s, d, "events")
          .select(col("event_type"), expr("ts div 86400000000").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"))
        val span = daily.groupBy("event_type")
          .agg(min("day").as("d0"), max("day").as("d1"))
        val spine = span.select(col("event_type"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
        spine.join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"),
            col("n").isNull.cast("long").as("is_gap"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        span AS (
          SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
          FROM daily GROUP BY 1),
        spine AS (
          SELECT event_type, unnest(generate_series(d0, d1)) AS day
          FROM span)
        SELECT s.event_type, s.day, COALESCE(dl.n, 0) AS n,
          CAST(dl.n IS NULL AS BIGINT) AS is_gap
        FROM spine s LEFT JOIN daily dl USING (event_type, day)""")),

    // ---- q174: pivot → unpivot round trip — `stack()` melts the
    //      q58-style wide table back to long form, and the oracle
    //      computes the long form DIRECTLY (plain GROUP BY): hash
    //      equality proves pivot∘unpivot = identity on the
    //      aggregate, including the NULL-drop of absent cells. ----
    QueryDef(
      "q174_unpivot",
      (s, d) => {
        val piv = t(s, d, "lineitem")
          .select(col("l_linestatus"), col("l_returnflag"),
            round(col("l_quantity") * 100).cast("long").as("qc"))
          .groupBy("l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(col("qc")))
        piv.selectExpr("l_linestatus",
            "stack(3, 'A', A, 'N', N, 'R', R) as (flag, s_qty_cents)")
          .filter(col("s_qty_cents").isNotNull)
      },
      Some("""
        SELECT l_linestatus, l_returnflag AS flag,
          CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
            AS s_qty_cents
        FROM lineitem
        GROUP BY 1, 2""")),

    // ---- q206: per-brand Pareto frontier (2-D skyline, minimize
    //      price and size) in ONE keyed sort instead of a dominance
    //      self-join: a part is dominated iff a strictly-cheaper part
    //      has size ≤ its own (RANGE-frame running min over price) or
    //      a same-price part is strictly smaller (per-price min).
    //      O(n log n) per brand vs the O(n²) pair join a naive skyline
    //      pays — the product/offer-curve op. Windows all key by
    //      brand, so one exchange serves both. ----
    QueryDef(
      "q206_pareto_frontier",
      (s, d) => {
        val parts = t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"),
            round(col("p_retailprice") * 100).cast("long").as("price_c"))
        val wStrict = Window.partitionBy("p_brand")
          .orderBy(col("price_c"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wSamePrice = Window.partitionBy("p_brand", "price_c")
        parts
          .withColumn("min_cheaper", min(col("p_size")).over(wStrict))
          .withColumn("min_same", min(col("p_size")).over(wSamePrice))
          .filter(
            (col("min_cheaper").isNull ||
              col("min_cheaper") > col("p_size")) &&
              col("min_same") === col("p_size"))
          .select(col("p_brand"), col("p_partkey"),
            col("price_c"), col("p_size").cast("long").as("size"))
      },
      Some("""
        WITH parts AS (
          SELECT p_partkey, p_brand, p_size,
            CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
          FROM part),
        w AS (
          SELECT *,
            MIN(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS min_cheaper,
            MIN(p_size) OVER (PARTITION BY p_brand, price_c)
              AS min_same
          FROM parts)
        SELECT p_brand, p_partkey, price_c,
          CAST(p_size AS BIGINT) AS size
        FROM w
        WHERE (min_cheaper IS NULL OR min_cheaper > p_size)
          AND min_same = p_size""")))
}
