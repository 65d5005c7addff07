package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t
import graft.operators.PrefixScan

/** Data-quality validation and physical-layout operators — the
  * pre-training gate a 100 TB pipeline runs before any corpus ships:
  * referential-integrity audits (q130), per-column profiling (q131), a
  * rule-based expectation suite (q132), and a z-order (Morton) layout
  * key with bucket-locality certification (q133).
  *
  * Scale shapes: every audit is a single scan with combinable
  * conditional aggregates; FK checks join child keys against DISTINCT
  * parent keys (broadcast for bounded dims, shuffle for fact-sized
  * parents); the z-order key is pure per-row bit arithmetic off a
  * one-row broadcast of the domain maxima.
  */
object Validation extends QueryPack {

  /** q309's Cramer expressions over the nine OLS sufficient
    * statistics. Leading multipliers (`nd`/`sx1d`/`sx2d`/`syd`) are
    * double casts of exact int64 sums: the INNER 2x2 minors stay
    * exact int64 (≤ ~1e16 under the shifted regressor domains), while
    * the degree-4 outer products — past int64 at this n — ride
    * correctly-rounded double math, identical bits in both engines.
    * OlsSpec pins the algebra on planted data where every product is
    * < 2^53 and the recovered coefficients are exact.
    */
  val OlsDet: String =
    "(nd * (s11 * s22 - s12 * s12) - sx1d * (sx1 * s22 - s12 * sx2)" +
      " + sx2d * (sx1 * s12 - s11 * sx2))"
  val OlsB0n: String =
    "(syd * (s11 * s22 - s12 * s12) - sx1d * (s1y * s22 - s12 * s2y)" +
      " + sx2d * (s1y * s12 - s11 * s2y))"
  val OlsB1n: String =
    "(nd * (s1y * s22 - s12 * s2y) - syd * (sx1 * s22 - s12 * sx2)" +
      " + sx2d * (sx1 * s2y - s1y * sx2))"
  val OlsB2n: String =
    "(nd * (s11 * s2y - s1y * s12) - sx1d * (sx1 * s2y - s1y * sx2)" +
      " + syd * (sx1 * s12 - s11 * sx2))"

  /** Interleave the low `bits` of x (even positions) and y (odd
    * positions) — the Morton / z-order curve key. Built from codegen'd
    * shift/mask built-ins only.
    */
  def morton(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftrightunsigned(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** One FK relation audit: child rows whose key has no LIVE parent.
    * Parent "liveness" is planted deterministically (key % prime != 0)
    * so orphans exist by construction and the counts are load-bearing.
    * The left join against distinct parent keys never duplicates child
    * rows (parent keys are unique) and counts orphans in the same pass
    * as totals — no separate anti-join scan.
    */
  private def fkAudit(
      rel: String,
      child: DataFrame, key: String,
      liveParentKeys: DataFrame, bcast: Boolean): DataFrame = {
    val pk = (if (bcast) broadcast(liveParentKeys) else liveParentKeys)
      .withColumn("ok", lit(1))
    child.select(col(key).as("k"))
      .join(pk, col("k") === col("pk"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("ok").isNull, 1L).otherwise(0L)).as("n_orphans"),
        countDistinct(when(col("ok").isNull, col("k"))).as("n_orphan_keys"))
      .select(lit(rel).as("relation"),
        col("n_rows"), col("n_orphans"), col("n_orphan_keys"))
  }

  /** One column's profile row: totals, nulls, exact distincts, min/max
    * (string columns report length bounds). Each profile is its own
    * single-column scan — column pruning reaches the parquet reader per
    * column, every aggregate is map-side combinable, and no EXPAND
    * blow-up from multi-countDistinct. The approximate path for wider
    * tables is q41's sketch family.
    */
  private def profile(df: DataFrame, c: String, numeric: Boolean): DataFrame = {
    val v = if (numeric) col(c).cast("double")
    else length(col(c)).cast("double")
    df.select(col(c), v.as("v"))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }

  /** One expectation rule: (name, checked, violations, one IEEE-exact
    * violation rate). `pass` must be null-safe (null counts as a
    * violation — unknown never passes a gate).
    */
  private def rule(df: DataFrame, name: String, pass: Column): DataFrame =
    df.agg(
      count(lit(1)).as("n_checked"),
      sum(when(coalesce(pass, lit(false)), 0L).otherwise(1L))
        .as("n_violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"),
        (col("n_violations").cast("double") /
          col("n_checked").cast("double")).as("violation_rate"))

  def defs: Seq[QueryDef] = Seq(
    // ---- q130: referential-integrity audit across the star schema.
    //      Liveness planting: parents with key % prime == 0 are treated
    //      as missing, so each relation has a deterministic nonzero
    //      orphan set in both engines. customer/part/supplier key sets
    //      broadcast (bounded dims); the orders parent joins by shuffle
    //      — the fact-sized-parent shape that holds at 100 TB. ----
    QueryDef(
      "q130_fk_audit",
      (s, d) => {
        val live = (df: DataFrame, k: String, p: Int) =>
          df.filter(col(k) % p =!= 0).select(col(k).as("pk")).distinct()
        fkAudit("orders->customer",
          t(s, d, "orders"), "o_custkey",
          live(t(s, d, "customer"), "c_custkey", 97), bcast = true)
          .unionByName(fkAudit("lineitem->orders",
            t(s, d, "lineitem"), "l_orderkey",
            live(t(s, d, "orders"), "o_orderkey", 89), bcast = false))
          .unionByName(fkAudit("lineitem->part",
            t(s, d, "lineitem"), "l_partkey",
            live(t(s, d, "part"), "p_partkey", 83), bcast = true))
          .unionByName(fkAudit("lineitem->supplier",
            t(s, d, "lineitem"), "l_suppkey",
            live(t(s, d, "supplier"), "s_suppkey", 79), bcast = true))
      },
      Some("""
        WITH a1 AS (
          SELECT 'orders->customer' AS relation,
            COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_orphans,
            COUNT(DISTINCT CASE WHEN p.pk IS NULL THEN o.o_custkey END)
              AS n_orphan_keys
          FROM orders o LEFT JOIN (
            SELECT DISTINCT c_custkey AS pk FROM customer
            WHERE c_custkey % 97 <> 0) p ON o.o_custkey = p.pk),
        a2 AS (
          SELECT 'lineitem->orders', COUNT(*),
            CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            COUNT(DISTINCT CASE WHEN p.pk IS NULL THEN l.l_orderkey END)
          FROM lineitem l LEFT JOIN (
            SELECT DISTINCT o_orderkey AS pk FROM orders
            WHERE o_orderkey % 89 <> 0) p ON l.l_orderkey = p.pk),
        a3 AS (
          SELECT 'lineitem->part', COUNT(*),
            CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            COUNT(DISTINCT CASE WHEN p.pk IS NULL THEN l.l_partkey END)
          FROM lineitem l LEFT JOIN (
            SELECT DISTINCT p_partkey AS pk FROM part
            WHERE p_partkey % 83 <> 0) p ON l.l_partkey = p.pk),
        a4 AS (
          SELECT 'lineitem->supplier', COUNT(*),
            CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            COUNT(DISTINCT CASE WHEN p.pk IS NULL THEN l.l_suppkey END)
          FROM lineitem l LEFT JOIN (
            SELECT DISTINCT s_suppkey AS pk FROM supplier
            WHERE s_suppkey % 79 <> 0) p ON l.l_suppkey = p.pk)
        SELECT * FROM a1 UNION ALL SELECT * FROM a2
        UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4""")),

    // ---- q131: per-column profile of lineitem (numerics report value
    //      bounds, strings length bounds; distincts are EXACT — the
    //      oracle-checkable path; q41 is the sketch substitute). ----
    QueryDef(
      "q131_column_profile",
      (s, d) => {
        val li = t(s, d, "lineitem")
        Seq(
          ("l_quantity", true), ("l_extendedprice", true),
          ("l_discount", true), ("l_tax", true),
          ("l_returnflag", false), ("l_linestatus", false))
          .map { case (c, num) => profile(li, c, num) }
          .reduce(_ unionByName _)
      },
      Some("""
        SELECT 'l_quantity' AS "column", COUNT(*) AS n_rows,
          COUNT(*) - COUNT(l_quantity) AS n_nulls,
          COUNT(DISTINCT l_quantity) AS n_distinct,
          CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
          CAST(MAX(l_quantity) AS DOUBLE) AS max_v FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
          COUNT(DISTINCT l_extendedprice),
          CAST(MIN(l_extendedprice) AS DOUBLE),
          CAST(MAX(l_extendedprice) AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
          COUNT(DISTINCT l_discount),
          CAST(MIN(l_discount) AS DOUBLE),
          CAST(MAX(l_discount) AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
          COUNT(DISTINCT l_tax),
          CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
          COUNT(DISTINCT l_returnflag),
          CAST(MIN(length(l_returnflag)) AS DOUBLE),
          CAST(MAX(length(l_returnflag)) AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', COUNT(*), COUNT(*) - COUNT(l_linestatus),
          COUNT(DISTINCT l_linestatus),
          CAST(MIN(length(l_linestatus)) AS DOUBLE),
          CAST(MAX(length(l_linestatus)) AS DOUBLE) FROM lineitem""")),

    // ---- q132: rule-based expectation suite (the great-expectations /
    //      dbt-test class). Thresholds chosen INSIDE the data's natural
    //      ranges so several rules genuinely fire and one passes clean —
    //      the counts are load-bearing, not vacuous zeros. One scan per
    //      table, conditional sums, rates as one IEEE division. ----
    QueryDef(
      "q132_expectations",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        rule(li, "lineitem.discount<=0.06", col("l_discount") <= 0.06)
          .unionByName(rule(li, "lineitem.quantity<=30",
            col("l_quantity") <= 30.0))
          .unionByName(rule(li, "lineitem.tax+discount<=0.12",
            col("l_tax") + col("l_discount") <= 0.12))
          .unionByName(rule(li, "lineitem.extendedprice>0",
            col("l_extendedprice") > 0.0))
          .unionByName(rule(o, "orders.totalprice<=300000",
            col("o_totalprice") <= 300000.0))
          .unionByName(rule(o, "orders.status_in_OF",
            col("o_orderstatus").isin("O", "F")))
      },
      Some("""
        SELECT 'lineitem.discount<=0.06' AS rule, COUNT(*) AS n_checked,
          CAST(SUM(CASE WHEN COALESCE(l_discount <= 0.06, FALSE)
            THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
          CAST(SUM(CASE WHEN COALESCE(l_discount <= 0.06, FALSE)
            THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) AS violation_rate
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.quantity<=30', COUNT(*),
          CAST(SUM(CASE WHEN COALESCE(l_quantity <= 30.0, FALSE)
            THEN 0 ELSE 1 END) AS BIGINT),
          CAST(SUM(CASE WHEN COALESCE(l_quantity <= 30.0, FALSE)
            THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'lineitem.tax+discount<=0.12', COUNT(*),
          CAST(SUM(CASE WHEN COALESCE(l_tax + l_discount <= 0.12, FALSE)
            THEN 0 ELSE 1 END) AS BIGINT),
          CAST(SUM(CASE WHEN COALESCE(l_tax + l_discount <= 0.12, FALSE)
            THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'lineitem.extendedprice>0', COUNT(*),
          CAST(SUM(CASE WHEN COALESCE(l_extendedprice > 0.0, FALSE)
            THEN 0 ELSE 1 END) AS BIGINT),
          CAST(SUM(CASE WHEN COALESCE(l_extendedprice > 0.0, FALSE)
            THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'orders.totalprice<=300000', COUNT(*),
          CAST(SUM(CASE WHEN COALESCE(o_totalprice <= 300000.0, FALSE)
            THEN 0 ELSE 1 END) AS BIGINT),
          CAST(SUM(CASE WHEN COALESCE(o_totalprice <= 300000.0, FALSE)
            THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) FROM orders
        UNION ALL
        SELECT 'orders.status_in_OF', COUNT(*),
          CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F')
            THEN 0 ELSE 1 END) AS BIGINT),
          CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F')
            THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) FROM orders""")),

    // ---- q133: z-order (Morton) layout key over (l_partkey,
    //      l_suppkey). Both dims scale to a 10-bit grid off a one-row
    //      broadcast of the maxima, interleave to a 20-bit key, and the
    //      top 6 key bits bucket the curve — each bucket is a 128×128
    //      rectangle in grid space BY CONSTRUCTION, which the emitted
    //      per-bucket min/max of BOTH dims certify (a 1-D sort key
    //      would span the full second dimension). At 100 TB the write
    //      path is repartitionByRange(zkey) + sortWithinPartitions:
    //      parquet min/max row-group stats then prune BOTH dimensions.
    //      The audit itself: one broadcast, per-row bit math, one
    //      combinable 64-group aggregate. ----
    QueryDef(
      "q133_zorder_layout",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"))
        val dom = li.agg(
          max(col("l_partkey")).as("max_pk"),
          max(col("l_suppkey")).as("max_sk"))
        li.crossJoin(broadcast(dom))
          // integer `div` on both sides — a double division could round
          // across an integer boundary and disagree with DuckDB's floor
          .select(
            expr("l_partkey * 1024L div (max_pk + 1L)").as("gx"),
            expr("l_suppkey * 1024L div (max_sk + 1L)").as("gy"))
          .withColumn("bucket",
            shiftrightunsigned(morton(col("gx"), col("gy"), 10), 14))
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_rows"),
            min(col("gx")).as("min_gx"), max(col("gx")).as("max_gx"),
            min(col("gy")).as("min_gy"), max(col("gy")).as("max_gy"))
      },
      Some("""
        WITH dom AS (
          SELECT MAX(l_partkey) AS max_pk, MAX(l_suppkey) AS max_sk
          FROM lineitem),
        g AS (
          SELECT CAST(l_partkey * 1024 // (max_pk + 1) AS BIGINT) AS gx,
            CAST(l_suppkey * 1024 // (max_sk + 1) AS BIGINT) AS gy
          FROM lineitem, dom),
        z AS (
          SELECT gx, gy,
            CAST(list_sum(list_transform(range(0, 10), b ->
              ((gx // (1::BIGINT << b)) % 2) * (1::BIGINT << (2 * b))
              + ((gy // (1::BIGINT << b)) % 2) * (1::BIGINT << (2 * b + 1))))
              AS BIGINT) // 16384 AS bucket
          FROM g)
        SELECT bucket, COUNT(*) AS n_rows,
          MIN(gx) AS min_gx, MAX(gx) AS max_gx,
          MIN(gy) AS min_gy, MAX(gy) AS max_gy
        FROM z GROUP BY bucket""")),

    // ---- q134: snapshot reconciliation — the migration-parity diff
    //      run when a table moves engines/lakes: full-outer join two
    //      snapshots on the key and classify every key as equal /
    //      value-drift / missing-in-replica / extra-in-replica. The
    //      replica derives deterministically from orders (key % 101
    //      dropped, % 103 price-doubled, % 107 re-keyed as inserts) so
    //      all four classes are populated by construction in both
    //      engines. Value equality compares exact cents (decimal cast),
    //      never raw doubles. ONE key-keyed full-outer shuffle + a
    //      combinable 4-group rollup; no collects, no skew hotspots
    //      (o_orderkey is unique on both sides). ----
    QueryDef(
      "q134_reconcile",
      (s, d) => {
        val base = t(s, d, "orders")
          .select(col("o_orderkey").as("k"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
        val replica = base.filter(col("k") % 101 =!= 0)
          .select(col("k"),
            when(col("k") % 103 === 0, col("v") * 2).otherwise(col("v"))
              .as("v"))
          .unionByName(
            base.filter(col("k") % 107 === 0)
              .select((col("k") + 10000000L).as("k"), col("v")))
        base.select(col("k"), col("v").as("v_base"))
          .join(replica.select(col("k"), col("v").as("v_repl")),
            Seq("k"), "full_outer")
          .select(
            when(col("v_base").isNull, "extra_in_replica")
              .when(col("v_repl").isNull, "missing_in_replica")
              .when(col("v_base") === col("v_repl"), "equal")
              .otherwise("value_mismatch").as("status"))
          .groupBy("status")
          .agg(count(lit(1)).as("n_keys"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS k,
            CAST(o_totalprice AS DECIMAL(18,2)) AS v
          FROM orders),
        replica AS (
          SELECT k,
            CASE WHEN k % 103 = 0 THEN v * 2 ELSE v END AS v
          FROM base WHERE k % 101 <> 0
          UNION ALL
          SELECT k + 10000000 AS k, v FROM base WHERE k % 107 = 0),
        j AS (
          SELECT b.k AS bk, b.v AS v_base, r.k AS rk, r.v AS v_repl
          FROM base b FULL OUTER JOIN replica r ON b.k = r.k)
        SELECT CASE
            WHEN bk IS NULL THEN 'extra_in_replica'
            WHEN rk IS NULL THEN 'missing_in_replica'
            WHEN v_base = v_repl THEN 'equal'
            ELSE 'value_mismatch' END AS status,
          COUNT(*) AS n_keys
        FROM j GROUP BY 1""")),

    // ---- q135: equal-width histogram of l_extendedprice (B=32) — the
    //      exact-arithmetic profiling companion to q131's bounds and
    //      q41's sketches. Bin edges come from integer CENTS (decimal
    //      cast, then floor division) so the bin index is bigint-exact
    //      in both engines — a double-typed (v-min)/width bin is NOT
    //      cross-engine stable (cast rounds in DuckDB, truncates in
    //      Spark). One-row min/max broadcast + a combinable 32-group
    //      count; densities are one IEEE division each. ----
    QueryDef(
      "q135_histogram",
      (s, d) => {
        val b = 32
        val li = t(s, d, "lineitem")
          .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        val dom = li.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        li.crossJoin(broadcast(dom))
          .select(col("cents"), col("lo"), col("hi"),
            least(lit(b - 1).cast("long"),
              expr(s"(cents - lo) * $b div (hi - lo + 1)")).as("bin"))
          .groupBy("bin")
          .agg(
            count(lit(1)).as("n"),
            min(col("cents")).as("min_cents"),
            max(col("cents")).as("max_cents"))
          .crossJoin(broadcast(li.agg(count(lit(1)).as("total"))))
          .select(col("bin"), col("n"), col("min_cents"), col("max_cents"),
            (col("n").cast("double") / col("total").cast("double"))
              .as("density"))
      },
      Some("""
        WITH c AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
            AS BIGINT) AS cents
          FROM lineitem),
        dom AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c),
        tot AS (SELECT COUNT(*) AS total FROM c),
        binned AS (
          SELECT cents,
            LEAST(31, (cents - lo) * 32 // (hi - lo + 1)) AS bin
          FROM c, dom)
        SELECT bin, COUNT(*) AS n,
          MIN(cents) AS min_cents, MAX(cents) AS max_cents,
          CAST(COUNT(*) AS DOUBLE) / total AS density
        FROM binned, tot
        GROUP BY bin, total""")),

    // ---- q136: KMV distinct sketch via the custom typed Aggregator
    //      (the engine's UDAF surface, SURVEY §2.14). Per language the
    //      sketch keeps the 5 smallest distinct token-md5 values —
    //      O(k) memory per group, map-side-combinable merge — and the
    //      5th minimum yields the Bar-Yossef (k-1)/u_k distinct
    //      estimate. Every retained value is a deterministic md5, so
    //      DuckDB re-derives the IDENTICAL sketch (per-group ordered
    //      limit) and the estimate is one IEEE division of exact
    //      operands: u_k parses the first 13 hex nibbles (52 bits,
    //      double-exact) over 2^52 (a power of two — exact). ----
    QueryDef(
      "q136_kmv_sketch",
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("lang"), explode(array_distinct(
            graft.functions.TextFunctions.tokens(lower(col("text")))))
            .as("tok"))
          .select(col("lang"), md5(col("tok")).as("h"))
        val sk = base.groupBy("lang")
          .agg(graft.functions.KmvSketch.kmvMinHex(col("h"), 5).as("mins"))
        sk.select(col("lang"), col("mins"),
            posexplode(col("mins")).as(Seq("i", "h")))
          .select(col("lang"), (col("i") + 1).cast("long").as("rank"),
            col("h"),
            (lit(4.0) / (conv(substring(element_at(col("mins"), 5), 1, 13),
              16, 10).cast("long").cast("double") / lit(4.503599627370496e15)))
              .as("est_distinct"))
      },
      Some("""
        WITH tk AS (
          SELECT lang, md5(unnest(list_distinct(
            regexp_split_to_array(trim(lower(text)), '\s+')))) AS h
          FROM documents),
        dh AS (SELECT DISTINCT lang, h FROM tk),
        rk AS (
          SELECT lang, h,
            row_number() OVER (PARTITION BY lang ORDER BY h) AS rank
          FROM dh),
        k5 AS (SELECT lang, h AS h5 FROM rk WHERE rank = 5)
        SELECT r.lang, CAST(r.rank AS BIGINT) AS rank, r.h,
          4.0 / (CAST(list_sum(list_transform(range(0, 13), i ->
              CAST(strpos('0123456789abcdef',
                substr(k.h5, CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
              * CAST(2 ** (4 * (12 - i)) AS BIGINT))) AS DOUBLE)
            / 4503599627370496.0) AS est_distinct
        FROM rk r JOIN k5 k USING (lang)
        WHERE r.rank <= 5""")),

    // ---- q137: key-skew profile — the measurement that justifies (or
    //      rejects) a Y4-style salting decision before a big keyed
    //      shuffle: per-key counts → the top-10 heavy hitters with
    //      their traffic share, plus the global max/mean skew ratio
    //      (1.0 = perfectly uniform; a task-killing hot key shows up
    //      as share → 1). One combinable count shuffle; the cut is
    //      TakeOrdered; rank is the bounded collect/posexplode fold;
    //      stats ride a one-row broadcast. All doubles are exact-
    //      operand single multiplications/divisions — cross-engine
    //      stable. ----
    QueryDef(
      "q137_skew_profile",
      (s, d) => {
        val counts = t(s, d, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        val stats = counts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("n_events")).as("total"),
          max(col("n_events")).as("max_n"))
        counts.orderBy(col("n_events").desc, col("user_id")).limit(10)
          .agg(sort_array(collect_list(
            struct((-col("n_events")).as("nn"), col("user_id")))).as("xs"))
          .select(posexplode(col("xs")))
          .select((col("pos") + 1).cast("long").as("rank"),
            col("col.user_id").as("user_id"),
            (-col("col.nn")).as("n_events"))
          .crossJoin(broadcast(stats))
          .select(col("rank"), col("user_id"), col("n_events"),
            (col("n_events").cast("double") / col("total").cast("double"))
              .as("share"),
            (col("max_n").cast("double") * col("n_keys").cast("double") /
              col("total").cast("double")).as("skew_ratio"))
      },
      Some("""
        WITH c AS (
          SELECT user_id, COUNT(*) AS n_events
          FROM events GROUP BY user_id),
        st AS (
          SELECT COUNT(*) AS n_keys,
            CAST(SUM(n_events) AS BIGINT) AS total,
            MAX(n_events) AS max_n
          FROM c),
        rk AS (
          SELECT user_id, n_events,
            row_number() OVER (ORDER BY n_events DESC, user_id) AS rank
          FROM c)
        SELECT CAST(rank AS BIGINT) AS rank, user_id, n_events,
          CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE) AS share,
          CAST(max_n AS DOUBLE) * CAST(n_keys AS DOUBLE)
            / CAST(total AS DOUBLE) AS skew_ratio
        FROM rk, st WHERE rank <= 10""")),

    // ---- q142: order-independent table content checksum — q134's
    //      companion for engine/lake migrations when the comparison has
    //      to travel (one row per table, not a row per key): each row
    //      serializes canonically (keys and exact CENTS, never a
    //      formatted double — double→string formatting is NOT
    //      cross-engine stable), hashes to a 60-bit md5 prefix, and the
    //      checksum is the plain SUM split into the value's low/high 30
    //      bits (two bigint sums — commutative, so partition order and
    //      engine are irrelevant, and a single flipped row moves the
    //      pair with probability 1-2^-60). One scan per table, fully
    //      map-side-combinable, zero shuffles beyond the 1-row agg. ----
    QueryDef(
      "q142_table_checksum",
      (s, d) => {
        val cksum = (df: DataFrame, tbl: String, canon: Column) =>
          df.select(
            conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
              .as("h"))
            .agg(count(lit(1)).as("n_rows"),
              sum(expr("h % 1073741824")).as("checksum_lo"),
              sum(expr("h div 1073741824")).as("checksum_hi"))
            .select(lit(tbl).as("tbl"), col("n_rows"),
              col("checksum_lo"), col("checksum_hi"))
        // NULLs serialize as an explicit sentinel on BOTH sides:
        // concat_ws silently SKIPS nulls (so (a,NULL,b) and (a,b,NULL)
        // would collide) and DuckDB's || NULLs the whole hash (so its
        // SUM would silently drop the row) — either default corrupts a
        // checksum exactly when it matters
        val nn = (c: Column) => coalesce(c.cast("string"), lit("<NULL>"))
        val cents = (c: Column) =>
          nn((c.cast("decimal(18,2)") * 100).cast("long"))
        // conditional input spreads (no-ops on a parallel scan): the
        // md5 canonicalization kernel is the whole cost and ran on one
        // scan task per table; the checksum sums are commutative so
        // the spread cannot move the result
        val spread = (df: org.apache.spark.sql.DataFrame, k: Column) =>
          graft.operators.InputSpread.byKey(df, k)
        cksum(spread(t(s, d, "orders"), col("o_orderkey")), "orders",
          concat_ws("|", nn(col("o_orderkey")),
            nn(col("o_custkey")), nn(col("o_orderstatus")),
            cents(col("o_totalprice"))))
          .unionByName(cksum(
            spread(t(s, d, "lineitem"), col("l_orderkey")), "lineitem",
            concat_ws("|", nn(col("l_orderkey")),
              nn(col("l_partkey")),
              nn(col("l_suppkey")),
              cents(col("l_quantity")), cents(col("l_extendedprice")))))
          .unionByName(cksum(
            spread(t(s, d, "customer"), col("c_custkey")), "customer",
            concat_ws("|", nn(col("c_custkey")), nn(col("c_name")),
              nn(col("c_nationkey")))))
      },
      Some("""
        WITH h1 AS (
          SELECT CAST(list_sum(list_transform(range(0, 15), i ->
              CAST(strpos('0123456789abcdef', substr(md5(
                COALESCE(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|'
                  || COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>') || '|'
                  || COALESCE(o_orderstatus, '<NULL>') || '|'
                  || COALESCE(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    * 100 AS BIGINT) AS VARCHAR), '<NULL>')),
                CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
              * CAST(2 ** (4 * (14 - i)) AS BIGINT))) AS BIGINT) AS h
          FROM orders),
        h2 AS (
          SELECT CAST(list_sum(list_transform(range(0, 15), i ->
              CAST(strpos('0123456789abcdef', substr(md5(
                COALESCE(CAST(l_orderkey AS VARCHAR), '<NULL>') || '|'
                  || COALESCE(CAST(l_partkey AS VARCHAR), '<NULL>') || '|'
                  || COALESCE(CAST(l_suppkey AS VARCHAR), '<NULL>') || '|'
                  || COALESCE(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * 100 AS BIGINT) AS VARCHAR), '<NULL>') || '|'
                  || COALESCE(CAST(CAST(CAST(l_extendedprice
                    AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR),
                    '<NULL>')),
                CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
              * CAST(2 ** (4 * (14 - i)) AS BIGINT))) AS BIGINT) AS h
          FROM lineitem),
        h3 AS (
          SELECT CAST(list_sum(list_transform(range(0, 15), i ->
              CAST(strpos('0123456789abcdef', substr(md5(
                COALESCE(CAST(c_custkey AS VARCHAR), '<NULL>') || '|'
                  || COALESCE(c_name, '<NULL>') || '|'
                  || COALESCE(CAST(c_nationkey AS VARCHAR), '<NULL>')),
                CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
              * CAST(2 ** (4 * (14 - i)) AS BIGINT))) AS BIGINT) AS h
          FROM customer)
        SELECT 'orders' AS tbl, COUNT(*) AS n_rows,
          CAST(SUM(h % 1073741824) AS BIGINT) AS checksum_lo,
          CAST(SUM(h // 1073741824) AS BIGINT) AS checksum_hi
        FROM h1
        UNION ALL
        SELECT 'lineitem', COUNT(*),
          CAST(SUM(h % 1073741824) AS BIGINT),
          CAST(SUM(h // 1073741824) AS BIGINT) FROM h2
        UNION ALL
        SELECT 'customer', COUNT(*),
          CAST(SUM(h % 1073741824) AS BIGINT),
          CAST(SUM(h // 1073741824) AS BIGINT) FROM h3""")),

    // ---- q145: KMV sketch set ALGEBRA — the reason engines keep
    //      mergeable distinct sketches (q136) instead of exact sets:
    //      union/intersection estimates between sources without ever
    //      joining their element sets. Per source the k=64 smallest
    //      distinct 3-gram md5s; for each source pair the union sketch
    //      is the k smallest of the merged sketches (EXACTLY the union
    //      set's sketch, by KMV's order-statistics closure), the union
    //      estimate is Bar-Yossef (k-1)/u_k, and the intersection
    //      estimate is the Jaccard-via-rho rule ρ/k · est_union
    //      (Beyer et al. 2007). Everything before the two final float
    //      ops is deterministic md5 order statistics, so DuckDB
    //      re-derives the IDENTICAL sketches; exact per-pair truth
    //      rides along (the pair sets are vocabulary-bounded here) so
    //      every row audits its own sketch error. Scale: per-source
    //      sketches are one combinable O(k) aggregate over the gram
    //      stream; the pair stage touches only S sketch rows — at
    //      100 TB the exact-truth columns are the part you drop, and
    //      the sketch columns are the part that still works. ----
    QueryDef(
      "q145_kmv_algebra",
      (s, d) => {
        val srcs = Seq("src0", "src1", "src2", "src3", "src4")
        val grams = t(s, d, "documents")
          .filter(col("source").isin(srcs: _*))
          .select(col("source"),
            explode(graft.functions.HashFunctions.ngramMd5(
              graft.functions.TextFunctions.tokens(lower(col("text"))), 3))
              .as("h"))
          .distinct()
        val sk = grams.groupBy("source")
          .agg(graft.functions.KmvSketch.kmvMinHex(col("h"), 64).as("sk"),
            count(lit(1)).as("n_exact"))
        val pairs = sk.select(col("source").as("src_a"), col("sk").as("sk_a"),
            col("n_exact").as("n_a"))
          .join(sk.select(col("source").as("src_b"), col("sk").as("sk_b"),
            col("n_exact").as("n_b")), col("src_a") < col("src_b"))
        val exactInter = grams.select(col("source").as("src_a"), col("h"))
          .join(grams.select(col("source").as("src_b"), col("h")),
            Seq("h"))
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("exact_inter"))
        val frac52 = (c: Column) =>
          conv(substring(c, 1, 13), 16, 10).cast("long").cast("double") /
            lit(4.503599627370496e15)
        pairs
          .withColumn("u", slice(array_sort(
            array_union(col("sk_a"), col("sk_b"))), 1, 64))
          .withColumn("rho", size(filter(col("u"), x =>
            array_contains(col("sk_a"), x) &&
              array_contains(col("sk_b"), x))).cast("long"))
          .withColumn("est_union", lit(63.0) / frac52(element_at(col("u"), 64)))
          .withColumn("est_inter",
            col("rho").cast("double") * col("est_union") / lit(64.0))
          .join(exactInter, Seq("src_a", "src_b"))
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
            (col("n_a") + col("n_b") - col("exact_inter")).as("exact_union"),
            col("exact_inter"), col("rho"), col("est_union"),
            col("est_inter"))
      },
      Some("""
        WITH tk AS (
          SELECT source,
            regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents
          WHERE source IN ('src0','src1','src2','src3','src4')),
        g AS (
          SELECT DISTINCT source,
            unnest(list_transform(range(1, len(toks) - 1),
              i -> md5(array_to_string(toks[i:i+2], ' ')))) AS h
          FROM tk WHERE len(toks) >= 3),
        rk AS (
          SELECT source, h,
            row_number() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM g),
        sk AS (
          SELECT source, list(h ORDER BY h) AS sk,
            (SELECT COUNT(*) FROM g g2 WHERE g2.source = rk.source)
              AS n_exact
          FROM rk WHERE rn <= 64 GROUP BY source),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
            a.sk AS sk_a, b.sk AS sk_b,
            CAST(a.n_exact AS BIGINT) AS n_a,
            CAST(b.n_exact AS BIGINT) AS n_b
          FROM sk a JOIN sk b ON a.source < b.source),
        ei AS (
          SELECT a.source AS src_a, b.source AS src_b,
            CAST(COUNT(*) AS BIGINT) AS exact_inter
          FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
          GROUP BY 1, 2),
        algebra AS (
          SELECT src_a, src_b, n_a, n_b, sk_a, sk_b,
            list_sort(list_distinct(list_concat(sk_a, sk_b)))[1:64] AS u
          FROM pairs),
        est AS (
          SELECT src_a, src_b, n_a, n_b,
            CAST(len(list_filter(u, x ->
              list_contains(sk_a, x) AND list_contains(sk_b, x)))
              AS BIGINT) AS rho,
            63.0 / (CAST(list_sum(list_transform(range(0, 13), i ->
                CAST(strpos('0123456789abcdef',
                  substr(u[64], CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
                * CAST(2 ** (4 * (12 - i)) AS BIGINT))) AS DOUBLE)
              / 4503599627370496.0) AS est_union
          FROM algebra)
        SELECT e.src_a, e.src_b, n_a, n_b,
          n_a + n_b - exact_inter AS exact_union, exact_inter,
          rho, est_union,
          CAST(rho AS DOUBLE) * est_union / 64.0 AS est_inter
        FROM est e JOIN ei USING (src_a, src_b)""")),

    // ---- q146: Count-Min frequency sketch (Cormode & Muthukrishnan
    //      2005) — q137 measures the exact heavy hitters; this is the
    //      bounded-memory path when the KEY DOMAIN itself is too wide
    //      to shuffle: a d=4 × w=64 counter matrix (md5-derived row
    //      hashes), point estimate = min over the d counters. Unlike
    //      the Misra-Gries summary the state is pure SUMS — order-free
    //      and engine-free — so the ENTIRE sketch, not just its
    //      guarantee, is DuckDB-oracle-exact: both engines derive the
    //      identical 256-cell matrix and identical estimates. Exact
    //      truth rides along per key; est >= exact always (one-sided
    //      error) and the overestimate column audits collision mass.
    //      Scale: the build is a map-side-combinable (r, cell) count —
    //      the shuffle carries <= 256 partial rows per task whatever
    //      the corpus size; estimates join keys against the broadcast
    //      matrix. ----
    QueryDef(
      "q146_countmin",
      (s, d) => {
        val cell = (r: Column, k: Column) =>
          conv(substring(md5(concat_ws(":", r, k)), 1, 8), 16, 10)
            .cast("long") % 64
        val ev = t(s, d, "events").select(col("user_id"))
        val counters = ev
          .select(explode(sequence(lit(0), lit(3))).as("r"), col("user_id"))
          .select(col("r"), cell(col("r"), col("user_id")).as("c"))
          .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
        val keys = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        keys
          .select(col("user_id"), col("exact_n"),
            explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("c", cell(col("r"), col("user_id")))
          .join(broadcast(counters), Seq("r", "c"))
          .groupBy("user_id", "exact_n")
          .agg(min(col("cnt")).as("est_n"))
          .select(col("user_id"), col("exact_n"), col("est_n"),
            (col("est_n") - col("exact_n")).as("overestimate"))
      },
      Some("""
        WITH ev AS (SELECT user_id FROM events),
        cells AS (
          SELECT r, user_id,
            CAST(list_sum(list_transform(range(0, 8), i ->
              CAST(strpos('0123456789abcdef', substr(
                md5(r || ':' || user_id), CAST(i + 1 AS INT), 1)) - 1
                AS BIGINT)
              * CAST(2 ** (4 * (7 - i)) AS BIGINT))) AS BIGINT) % 64 AS c
          FROM ev, range(0, 4) t(r)),
        counters AS (
          SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
        keys AS (
          SELECT user_id, COUNT(*) AS exact_n FROM ev GROUP BY 1),
        probe AS (
          SELECT k.user_id, k.exact_n, t.r,
            CAST(list_sum(list_transform(range(0, 8), i ->
              CAST(strpos('0123456789abcdef', substr(
                md5(t.r || ':' || k.user_id), CAST(i + 1 AS INT), 1)) - 1
                AS BIGINT)
              * CAST(2 ** (4 * (7 - i)) AS BIGINT))) AS BIGINT) % 64 AS c
          FROM keys k, range(0, 4) t(r))
        SELECT p.user_id, p.exact_n,
          CAST(MIN(cnt) AS BIGINT) AS est_n,
          CAST(MIN(cnt) - p.exact_n AS BIGINT) AS overestimate
        FROM probe p JOIN counters USING (r, c)
        GROUP BY p.user_id, p.exact_n""")),

    // ---- q169: incremental aggregate maintenance WITH RETRACTIONS —
    //      the materialized-view algebra a CDC-fed warehouse needs:
    //      a standing (event_type, day) aggregate is maintained by
    //      folding an op-signed delta batch (+1 inserts, −1 deletes)
    //      into it; groups whose maintained count reaches zero drop
    //      out. Partition: base = event_id % 5 != 0; inserts = the
    //      rest; retractions = base rows with event_id % 10 == 1 — so
    //      the maintained view covers (all − retracted). The oracle
    //      is deliberately ASYMMETRIC (the q149 discipline): Spark
    //      does base + delta maintenance, DuckDB RECOMPUTES from the
    //      post-change row set — hash equality proves the maintenance
    //      algebra equals a rebuild, retractions included. Scale: the
    //      delta pass touches only changed rows; the merge is one
    //      keyed outer join of two aggregate tables. ----
    QueryDef(
      "q169_agg_maintenance",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            expr("ts div 86400000000").as("day"),
            round(col("value") * 100).cast("long").as("cents"))
          .filter(col("cents").isNotNull)
        val base = ev.filter(col("event_id") % 5 =!= 0)
        val baseAgg = base.groupBy("event_type", "day")
          .agg(count(lit(1)).as("n0"), sum(col("cents")).as("s0"))
        // op-signed delta: inserts (+1) and retractions (−1)
        val delta = ev.filter(col("event_id") % 5 === 0)
          .withColumn("op", lit(1L))
          .unionByName(base.filter(col("event_id") % 10 === 1)
            .withColumn("op", lit(-1L)))
        val deltaAgg = delta.groupBy("event_type", "day")
          .agg(sum(col("op")).as("dn"),
            sum(col("op") * col("cents")).as("ds"))
        baseAgg.join(deltaAgg, Seq("event_type", "day"), "full_outer")
          .select(col("event_type"), col("day"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n"),
            (coalesce(col("s0"), lit(0L)) + coalesce(col("ds"), lit(0L)))
              .as("s_cents"))
          .filter(col("n") > 0)
      },
      Some("""
        WITH ev AS (
          SELECT event_id, event_type,
            epoch_us(ts) // 86400000000 AS day,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events WHERE "value" IS NOT NULL),
        -- the REBUILD side: the post-change row set directly
        kept AS (
          SELECT * FROM ev
          WHERE NOT (event_id % 5 <> 0 AND event_id % 10 = 1))
        SELECT event_type, day, COUNT(*) AS n,
          CAST(SUM(cents) AS BIGINT) AS s_cents
        FROM kept GROUP BY 1, 2""")),

    // ---- q175: distribution drift between two corpus snapshots —
    //      has the value distribution moved between batch A (even
    //      event_id) and batch B (odd)? Per (type, dollar-bucket) the
    //      cross-normalized integer drift term |n_a·N_b − n_b·N_a|
    //      (the total-variation numerator under cross-multiplication
    //      — no division crosses the engines); bounded by N_a·N_b,
    //      well inside int64. Scale: two map-side-combined counts and
    //      one broadcast of per-type totals. ----
    QueryDef(
      "q175_dist_drift",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
          .filter(col("cents").isNotNull)
          .withColumn("bucket", expr("cents div 100"))
          .withColumn("snap",
            when(col("event_id") % 2 === 0, lit("a")).otherwise(lit("b")))
        val cnt = ev.groupBy("event_type", "bucket")
          .agg(
            sum(when(col("snap") === "a", 1L).otherwise(0L)).as("n_a"),
            sum(when(col("snap") === "b", 1L).otherwise(0L)).as("n_b"))
        val tot = cnt.groupBy("event_type")
          .agg(sum("n_a").as("na_tot"), sum("n_b").as("nb_tot"))
        cnt.join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("bucket"), col("n_a"),
            col("n_b"),
            abs(col("n_a") * col("nb_tot") - col("n_b") * col("na_tot"))
              .as("drift_term"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, event_id,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events WHERE "value" IS NOT NULL),
        cnt AS (
          SELECT event_type, cents // 100 AS bucket,
            CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b
          FROM ev GROUP BY 1, 2),
        tot AS (
          SELECT event_type,
            CAST(SUM(n_a) AS BIGINT) AS na_tot,
            CAST(SUM(n_b) AS BIGINT) AS nb_tot
          FROM cnt GROUP BY 1)
        SELECT c.event_type, c.bucket, c.n_a, c.n_b,
          abs(c.n_a * t.nb_tot - c.n_b * t.na_tot) AS drift_term
        FROM cnt c JOIN tot t USING (event_type)""")),

    // ---- q177: Benford leading-digit audit — the fraud / synthetic-
    //      data smell test: observed leading-digit frequencies of the
    //      cents column vs Benford's log10(1 + 1/d), per type. The
    //      expected ppm values are PRECOMPUTED integer literals
    //      (identical constants in both engines — no runtime log);
    //      the leading digit comes from the decimal string, exact in
    //      any engine. ----
    QueryDef(
      "q177_benford_audit",
      (s, d) => {
        val expPpm = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
          4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
          8 -> 51153L, 9 -> 45757L)
        val expCol = expPpm.foldLeft(lit(null).cast("long")) {
          case (acc, (dgt, ppm)) =>
            when(col("d") === dgt, lit(ppm)).otherwise(acc)
        }
        val ev = t(s, d, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
          .filter(col("cents").isNotNull && col("cents") > 0)
          .withColumn("d",
            substring(col("cents").cast("string"), 1, 1).cast("long"))
        val cnt = ev.groupBy("event_type", "d")
          .agg(count(lit(1)).as("n_d"))
        val tot = cnt.groupBy("event_type").agg(sum("n_d").as("n_tot"))
        cnt.join(broadcast(tot), Seq("event_type"))
          .withColumn("obs_ppm", expr("n_d * 1000000 div n_tot"))
          .withColumn("exp_ppm", expCol)
          .select(col("event_type"), col("d"), col("n_d"), col("n_tot"),
            col("obs_ppm"), col("exp_ppm"),
            (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events
          WHERE "value" IS NOT NULL AND round("value" * 100) > 0),
        dg AS (
          SELECT event_type,
            CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS d
          FROM ev),
        cnt AS (
          SELECT event_type, d, COUNT(*) AS n_d FROM dg GROUP BY 1, 2),
        tot AS (
          SELECT event_type, CAST(SUM(n_d) AS BIGINT) AS n_tot
          FROM cnt GROUP BY 1),
        expe AS (
          SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
            (4, 96910), (5, 79181), (6, 66947), (7, 57992),
            (8, 51153), (9, 45757)) e(d, exp_ppm))
        SELECT c.event_type, c.d, c.n_d, t.n_tot,
          c.n_d * 1000000 // t.n_tot AS obs_ppm,
          CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
          c.n_d * 1000000 // t.n_tot - e.exp_ppm AS dev_ppm
        FROM cnt c
        JOIN tot t USING (event_type)
        JOIN expe e ON e.d = c.d""")),

    // ---- q178: audience overlap by activity bitmask — which
    //      combinations of event types does each user exhibit, and
    //      how big is every segment? BIT_OR folds each user's types
    //      into one int (map-side combinable, 5 bits here), then one
    //      count per mask — the Venn-diagram / cohort-overlap audit
    //      without 2^k set intersections. popcount ships as the
    //      bit-string trick (length minus zeros of the binary form,
    //      identical in both engines). ----
    QueryDef(
      "q178_type_overlap",
      (s, d) => {
        val bit = when(col("event_type") === "click", 1L)
          .when(col("event_type") === "error", 2L)
          .when(col("event_type") === "purchase", 4L)
          .when(col("event_type") === "signup", 8L)
          .otherwise(16L) // view
        val masks = t(s, d, "events")
          .select(col("user_id"), bit.as("b"))
          .groupBy("user_id")
          .agg(expr("bit_or(b)").as("mask"))
        masks.groupBy("mask")
          .agg(count(lit(1)).as("n_users"))
          .withColumn("n_types",
            (length(bin(col("mask"))) -
              length(regexp_replace(bin(col("mask")), "1", "")))
              .cast("long"))
          .select("mask", "n_types", "n_users")
      },
      Some("""
        WITH b AS (
          SELECT user_id,
            CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
              ELSE 16 END AS b
          FROM events),
        masks AS (
          SELECT user_id, CAST(bit_or(CAST(b AS BIGINT)) AS BIGINT)
            AS mask
          FROM b GROUP BY user_id)
        SELECT mask,
          CAST(length(bin(mask))
            - length(replace(bin(mask), '1', '')) AS BIGINT) AS n_types,
          COUNT(*) AS n_users
        FROM masks GROUP BY mask""")),

    // ---- q179: weighted median by value level — the weighted
    //      quantile without a sort of the rows: aggregate weights to
    //      the distinct (type, cents) domain (q168 discipline), one
    //      partitioned prefix sum over levels, pick the first level
    //      whose doubled cumulative weight reaches the total. Exact
    //      integers end to end. ----
    QueryDef(
      "q179_weighted_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lvl = t(s, d, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"),
            (col("event_id") % 10 + 1).as("wt"))
          .filter(col("cents").isNotNull)
          .groupBy("event_type", "cents")
          .agg(sum(col("wt")).as("w"))
        val w = Window.partitionBy("event_type").orderBy("cents")
        val tot = lvl.groupBy("event_type").agg(sum("w").as("w_tot"))
        val cum = lvl
          .withColumn("cw", sum(col("w"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .join(broadcast(tot), Seq("event_type"))
          .filter(col("cw") * 2 >= col("w_tot"))
        val pick = Window.partitionBy("event_type").orderBy("cents")
        cum.withColumn("rn", row_number().over(pick))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("w_tot"),
            col("cents").as("weighted_median_cents"),
            col("cw").as("cum_weight_at_median"))
      },
      Some("""
        WITH lvl AS (
          SELECT event_type,
            CAST(round("value" * 100) AS BIGINT) AS cents,
            CAST(SUM(event_id % 10 + 1) AS BIGINT) AS w
          FROM events WHERE "value" IS NOT NULL
          GROUP BY 1, 2),
        tot AS (
          SELECT event_type, CAST(SUM(w) AS BIGINT) AS w_tot
          FROM lvl GROUP BY 1),
        cum AS (
          SELECT l.event_type, l.cents, t.w_tot,
            CAST(SUM(l.w) OVER (PARTITION BY l.event_type
              ORDER BY l.cents ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS cw
          FROM lvl l JOIN tot t USING (event_type)),
        hit AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY cents) AS rn
          FROM cum WHERE cw * 2 >= w_tot)
        SELECT event_type, w_tot,
          cents AS weighted_median_cents,
          cw AS cum_weight_at_median
        FROM hit WHERE rn = 1""")),

    // ---- q180: order↔lineitem monetary reconciliation — does the
    //      order header total equal the recomputed line-level charge
    //      Σ ext·(1−disc)·(1+tax)? All money moves as exact integers:
    //      cents × (100−d) × (100+t) in 10⁻⁶-dollar units vs the
    //      header total scaled to the same units. The per-order diff
    //      distribution (matched / off-by / max drift) is the
    //      warehouse conformance gate; on TPC-H-ish synthetic data
    //      the diffs are real and the AUDIT must still agree
    //      engine-to-engine. ----
    QueryDef(
      "q180_order_reconcile",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"),
            round(col("l_extendedprice") * 100).cast("long").as("ec"),
            round(col("l_discount") * 100).cast("long").as("dc"),
            round(col("l_tax") * 100).cast("long").as("tc"))
          .withColumn("charge_e6",
            col("ec") * (lit(100L) - col("dc")) * (lit(100L) + col("tc")))
          .groupBy("o_orderkey")
          .agg(sum(col("charge_e6")).as("computed_e6"),
            count(lit(1)).as("n_lines"))
        t(s, d, "orders")
          .select(col("o_orderkey"),
            (round(col("o_totalprice") * 100).cast("long") * 10000L)
              .as("stored_e6"))
          .join(li, Seq("o_orderkey"), "inner")
          .withColumn("diff_e6", col("computed_e6") - col("stored_e6"))
          .groupBy(lit(1).as("grp"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("diff_e6") === 0, 1L).otherwise(0L))
              .as("n_exact"),
            max(abs(col("diff_e6"))).as("max_abs_diff_e6"),
            sum(abs(col("diff_e6"))).as("sum_abs_diff_e6"))
          .drop("grp")
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey AS o_orderkey,
            CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l_discount * 100) AS BIGINT))
              * (100 + CAST(round(l_tax * 100) AS BIGINT)))
              AS BIGINT) AS computed_e6,
            COUNT(*) AS n_lines
          FROM lineitem GROUP BY 1),
        j AS (
          SELECT o.o_orderkey,
            li.computed_e6
              - CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000
              AS diff_e6
          FROM orders o JOIN li USING (o_orderkey))
        SELECT COUNT(*) AS n_orders,
          CAST(SUM(CASE WHEN diff_e6 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_exact,
          CAST(MAX(abs(diff_e6)) AS BIGINT) AS max_abs_diff_e6,
          CAST(SUM(abs(diff_e6)) AS BIGINT) AS sum_abs_diff_e6
        FROM j""")),

    // ---- q191: Mann-Whitney rank-sum statistic, EXACT with ties —
    //      the nonparametric A/B test behind "did the distribution
    //      shift?". Snapshot A (even event_id) vs B (odd), per type:
    //      doubled rank sums stay integral under midrank tie handling
    //      (2·R_A = Σ_levels n_a·(2·cum_before + cnt + 1)), so
    //      2U_A = 2R_A − n_a(n_a+1) ships as int64 — no .5 ever
    //      materializes. Computed over the distinct VALUE DOMAIN
    //      (q168 discipline), never a per-row sort. ----
    QueryDef(
      "q191_rank_sum_test",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lvl = t(s, d, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
          .filter(col("cents").isNotNull)
          .groupBy("event_type", "cents")
          .agg(
            sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L))
              .as("na_lvl"),
            sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L))
              .as("nb_lvl"))
          .withColumn("cnt", col("na_lvl") + col("nb_lvl"))
        val w = Window.partitionBy("event_type").orderBy("cents")
        lvl
          .withColumn("cum", sum(col("cnt"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cum_before", col("cum") - col("cnt"))
          .groupBy("event_type")
          .agg(sum(col("na_lvl")).as("n_a"),
            sum(col("nb_lvl")).as("n_b"),
            sum(col("na_lvl") * (col("cum_before") * 2 + col("cnt") + 1))
              .as("two_r_a"))
          .withColumn("two_u_a",
            col("two_r_a") - col("n_a") * (col("n_a") + 1))
          .withColumn("two_u_mean", col("n_a") * col("n_b"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, event_id,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events WHERE "value" IS NOT NULL),
        lvl AS (
          SELECT event_type, cents,
            CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS na_lvl,
            CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS nb_lvl
          FROM ev GROUP BY 1, 2),
        cum AS (
          SELECT event_type, na_lvl, nb_lvl,
            na_lvl + nb_lvl AS cnt,
            CAST(SUM(na_lvl + nb_lvl) OVER (PARTITION BY event_type
              ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT)
              - (na_lvl + nb_lvl) AS cum_before
          FROM lvl),
        agg AS (
          SELECT event_type,
            CAST(SUM(na_lvl) AS BIGINT) AS n_a,
            CAST(SUM(nb_lvl) AS BIGINT) AS n_b,
            CAST(SUM(na_lvl * (cum_before * 2 + cnt + 1)) AS BIGINT)
              AS two_r_a
          FROM cum GROUP BY 1)
        SELECT event_type, n_a, n_b, two_r_a,
          two_r_a - n_a * (n_a + 1) AS two_u_a,
          n_a * n_b AS two_u_mean
        FROM agg""")),

    // ---- q192: decile profile — row-deterministic value deciles per
    //      type ((rn−1)·10 div n over the fully tie-broken rank),
    //      with per-decile counts, exact cent sums and extremes: the
    //      lift-table / score-calibration report shape. ----
    QueryDef(
      "q192_decile_profile",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
          .filter(col("cents").isNotNull)
        val w = Window.partitionBy("event_type")
          .orderBy(col("cents"), col("event_id"))
        val tot = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        ev
          .withColumn("rn", row_number().over(w).cast("long"))
          .join(broadcast(tot), Seq("event_type"))
          .withColumn("decile", expr("(rn - 1) * 10 div n") + 1)
          .groupBy("event_type", "decile")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("cents")).as("s_cents"),
            min(col("cents")).as("lo_cents"),
            max(col("cents")).as("hi_cents"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, event_id,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events WHERE "value" IS NOT NULL),
        ranked AS (
          SELECT event_type, cents,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY cents, event_id) AS BIGINT) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM ev)
        SELECT event_type, (rn - 1) * 10 // n + 1 AS decile,
          COUNT(*) AS n_rows,
          CAST(SUM(cents) AS BIGINT) AS s_cents,
          CAST(MIN(cents) AS BIGINT) AS lo_cents,
          CAST(MAX(cents) AS BIGINT) AS hi_cents
        FROM ranked GROUP BY 1, 2""")),

    // ---- q198: largest-remainder proration — allocate each order's
    //      total (in cents) across its line items proportional to
    //      quantity so the per-order allocations sum EXACTLY to the
    //      total: base_i = floor(T·q_i/Q), then the r = T − Σbase
    //      largest fractional remainders (tie-broken by line number)
    //      get +1 cent (Hamilton's method). All-integer arithmetic;
    //      the financial-allocation op where "roughly proportional"
    //      is a reconciliation break. One order-keyed shuffle; the
    //      window is per order (bounded fan-out ≤ 7 lines). ----
    QueryDef(
      "q198_prorate_allocation",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("q"))
        val ord = t(s, d, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("tot"))
        val base = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .withColumn("qsum",
            sum(col("q")).over(Window.partitionBy("l_orderkey")))
          .withColumn("base", expr("tot * q div qsum"))
          .withColumn("frac", expr("(tot * q) % qsum"))
        val w = Window.partitionBy("l_orderkey")
          .orderBy(col("frac").desc, col("l_linenumber"))
        base
          .withColumn("short",
            col("tot") - sum(col("base"))
              .over(Window.partitionBy("l_orderkey")))
          .withColumn("rk", row_number().over(w))
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("base") +
              when(col("rk") <= col("short"), 1L).otherwise(0L))
              .as("alloc_cents"))
      },
      Some("""
        WITH j AS (
          SELECT l_orderkey, l_linenumber,
            CAST(l_quantity AS BIGINT) AS q,
            CAST(round(o_totalprice * 100) AS BIGINT) AS tot
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        b AS (
          SELECT *,
            CAST(SUM(q) OVER (PARTITION BY l_orderkey) AS BIGINT)
              AS qsum
          FROM j),
        c AS (
          SELECT l_orderkey, l_linenumber, tot,
            tot * q // qsum AS base, (tot * q) % qsum AS frac
          FROM b),
        r AS (
          SELECT *,
            tot - CAST(SUM(base) OVER (PARTITION BY l_orderkey)
              AS BIGINT) AS short,
            row_number() OVER (PARTITION BY l_orderkey
              ORDER BY frac DESC, l_linenumber) AS rk
          FROM c)
        SELECT l_orderkey, l_linenumber,
          base + CASE WHEN rk <= short THEN 1 ELSE 0 END
            AS alloc_cents
        FROM r""")),

    // ---- q202: Tukey IQR fences via percentile_cont — quartiles at
    //      DYADIC p (0.25/0.75) over integer cents interpolate as
    //      a + f·(b−a) with f ∈ {0, .25, .5, .75}: every intermediate
    //      is exactly representable in fp64, so Spark and DuckDB (both
    //      R-7 linear interpolation) emit bit-identical doubles — the
    //      CONT counterpart of the q50/q153 disc discipline. Fences at
    //      ±1.5·IQR (again dyadic) count outliers per type. One
    //      combinable aggregate + one broadcast join back. ----
    QueryDef(
      "q202_quartile_fences",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val qs = ev.groupBy("event_type")
          .agg(
            expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY cents)")
              .as("q1"),
            expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY cents)")
              .as("q3"))
          .withColumn("lo_fence", col("q1") - (col("q3") - col("q1")) * 1.5)
          .withColumn("hi_fence", col("q3") + (col("q3") - col("q1")) * 1.5)
        ev.join(broadcast(qs), Seq("event_type"))
          .groupBy("event_type")
          .agg(
            first(col("q1")).as("q1"),
            first(col("q3")).as("q3"),
            first(col("lo_fence")).as("lo_fence"),
            first(col("hi_fence")).as("hi_fence"),
            sum(when(col("cents") < col("lo_fence"), 1L).otherwise(0L))
              .as("n_low"),
            sum(when(col("cents") > col("hi_fence"), 1L).otherwise(0L))
              .as("n_high"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events),
        qs AS (
          SELECT event_type,
            quantile_cont(cents, 0.25) AS q1,
            quantile_cont(cents, 0.75) AS q3
          FROM ev GROUP BY 1),
        f AS (
          SELECT event_type, q1, q3,
            q1 - (q3 - q1) * 1.5 AS lo_fence,
            q3 + (q3 - q1) * 1.5 AS hi_fence
          FROM qs)
        SELECT ev.event_type, f.q1, f.q3, f.lo_fence, f.hi_fence,
          CAST(SUM(CASE WHEN cents < lo_fence THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
          CAST(SUM(CASE WHEN cents > hi_fence THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high
        FROM ev JOIN f ON ev.event_type = f.event_type
        GROUP BY 1, 2, 3, 4, 5""")),

    // ---- q209: CUPED variance reduction — the A/B-testing adjustment
    //      Y − θ·(X − X̄) with θ = cov(X,Y)/var(X) from PRE-period
    //      covariates (Deng et al. 2013). Per-user period sums are
    //      exact integers; the pooled moment row uses the q49 decimal-
    //      sum discipline (exact sums → double, then one identical
    //      IEEE expression in both engines). Two keyed aggregates
    //      (user, then arm) + two broadcast scalar rows — the whole
    //      experiment readout costs one fact pass at any scale. ----
    QueryDef(
      "q209_cuped_adjustment",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("ts"),
            round(col("value") * 100).cast("long").as("cents"))
        val rng = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        val per = ev.crossJoin(broadcast(rng))
          .withColumn("pre", col("ts") < expr("(lo + hi) div 2"))
          .groupBy("user_id")
          .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
            sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
          .withColumn("arm", col("user_id") % 2)
        val xd = col("x").cast("decimal(19,0)")
        val yd = col("y").cast("decimal(19,0)")
        val stats = per.agg(
          count(lit(1)).cast("double").as("n"),
          sum(xd).cast("double").as("sx"),
          sum(yd).cast("double").as("sy"),
          sum(xd * xd).cast("double").as("sxx"),
          sum(xd * yd).cast("double").as("sxy"))
          .withColumn("theta",
            when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0,
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                (col("n") * col("sxx") - col("sx") * col("sx"))))
          .withColumn("xbar", col("sx") / col("n"))
          .select("theta", "xbar")
        per.groupBy("arm")
          .agg(count(lit(1)).as("n_users"),
            sum(xd).cast("double").as("ax"),
            sum(yd).cast("double").as("ay"))
          .crossJoin(broadcast(stats))
          .select(col("arm"), col("n_users"), col("theta"),
            (col("ay") / col("n_users").cast("double")).as("mean_y"),
            (col("ay") / col("n_users").cast("double") -
              col("theta") *
                (col("ax") / col("n_users").cast("double") - col("xbar")))
              .as("mean_y_adj"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS ts,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events),
        rng AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM ev),
        per AS (
          SELECT user_id, user_id % 2 AS arm,
            CAST(SUM(CASE WHEN ts < (lo + hi) // 2 THEN cents
              ELSE 0 END) AS BIGINT) AS x,
            CAST(SUM(CASE WHEN ts >= (lo + hi) // 2 THEN cents
              ELSE 0 END) AS BIGINT) AS y
          FROM ev, rng GROUP BY 1, 2),
        st AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
            CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              AS DOUBLE) AS sxx,
            CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DOUBLE) AS sxy
          FROM per),
        th AS (
          SELECT
            CASE WHEN n * sxx - sx * sx <> 0.0 THEN
              (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS theta,
            sx / n AS xbar
          FROM st)
        SELECT arm, COUNT(*) AS n_users, theta,
          CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS mean_y,
          CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)
            - theta * (CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) - xbar) AS mean_y_adj
        FROM per, th GROUP BY arm, theta, xbar""")),

    // ---- q213: ID-gap ranges — the sequence-integrity audit ("which
    //      ids are missing?") WITHOUT a global-order window. Three
    //      levels: ids lag within 256-id BLOCKS (keyed window), block
    //      min/max summaries lag within 65536-block SUPER-blocks
    //      (keyed window, 256× smaller input), and the super-block
    //      summaries — domain/2^24 rows — fold on the driver (the
    //      q190 bounded-collect shape; add a fourth level before this
    //      outgrows one collect). The oracle is the plain global-lag
    //      query: hash equality proves hierarchical stitch ≡ one
    //      global scan. Synthetic deletions (id % 97 = 0) plant gaps
    //      deterministically. ----
    QueryDef(
      "q213_id_gap_ranges",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val B = 256
        val ids = t(s, d, "events")
          .select(col("event_id").as("id"))
          .filter(col("id") % 97 =!= 0)
          .distinct()
          .withColumn("blk", expr(s"id div $B"))
        val wLocal = Window.partitionBy("blk").orderBy("id")
        val local = ids
          .withColumn("prev", lag(col("id"), 1).over(wLocal))
          .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
          .select((col("prev") + 1).as("gap_start"),
            (col("id") - 1).as("gap_end"))
        val summaries = ids.groupBy("blk")
          .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
          .withColumn("sblk", expr("blk div 65536"))
        val wSuper = Window.partitionBy("sblk").orderBy("blk")
        val stitch = summaries
          .withColumn("prev_mx", lag(col("mx"), 1).over(wSuper))
          .filter(col("prev_mx").isNotNull &&
            col("mn") - col("prev_mx") > 1)
          .select((col("prev_mx") + 1).as("gap_start"),
            (col("mn") - 1).as("gap_end"))
        // level 3: cross-super-block seams — domain/2^24 rows, driver
        val seams = summaries.groupBy("sblk")
          .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"))
          .collect().sortBy(_.getAs[Long]("sblk"))
          .sliding(2).collect {
            case Array(a, b)
                if b.getAs[Long]("mn") - a.getAs[Long]("mx") > 1 =>
              (a.getAs[Long]("mx") + 1, b.getAs[Long]("mn") - 1)
          }.toSeq
        val spark0 = ids.sparkSession
        import spark0.implicits._
        local.unionByName(stitch)
          .unionByName(seams.toDF("gap_start", "gap_end"))
          .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
      },
      Some("""
        WITH ids AS (
          SELECT DISTINCT event_id AS id FROM events
          WHERE event_id % 97 <> 0),
        l AS (
          SELECT id, lag(id) OVER (ORDER BY id) AS prev FROM ids)
        SELECT prev + 1 AS gap_start, id - 1 AS gap_end,
          id - prev - 1 AS gap_len
        FROM l WHERE prev IS NOT NULL AND id - prev > 1""")),

    // ---- q219: two-sample Q-Q table — click vs view revenue deciles
    //      side by side (the distribution-comparison readout behind
    //      every Q-Q plot). Each side reduces to ONE row carrying a
    //      9-element disc-percentile array (element-picking, cast
    //      long), posexploded into the decile table — a bounded
    //      two-row broadcast join, zero fact-side shuffles beyond the
    //      two aggregates. Complements q61's KS statistic (a single
    //      worst-gap number) with the per-decile shape. ----
    QueryDef(
      "q219_qq_table",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        def side(tpe: String, out: String) = ev
          .filter(col("event_type") === tpe)
          .agg(array((1 to 9).map(k =>
            expr(s"percentile_disc(0.${k}) WITHIN GROUP " +
              "(ORDER BY cents)").cast("long")): _*).as(out))
        side("click", "qa").crossJoin(side("view", "qb"))
          .select(posexplode(arrays_zip(col("qa"), col("qb"))))
          .select((col("pos") + 1).as("decile"),
            col("col.qa").as("q_click"), col("col.qb").as("q_view"),
            (col("col.qa") - col("col.qb")).as("diff_cents"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events),
        qa AS (
          SELECT quantile_disc(cents,
            [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS l
          FROM ev WHERE event_type = 'click'),
        qb AS (
          SELECT quantile_disc(cents,
            [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS l
          FROM ev WHERE event_type = 'view'),
        ks AS (SELECT unnest(range(1, 10)) AS decile)
        SELECT decile, qa.l[decile] AS q_click, qb.l[decile] AS q_view,
          qa.l[decile] - qb.l[decile] AS diff_cents
        FROM ks, qa, qb""")),

    // ---- q221: histogram-intersection similarity between event types
    //      — Σ min(count_a(bin), count_b(bin)) over value bins, the
    //      integer distribution-similarity kernel (Swain & Ballard's
    //      histogram intersection). Bins aggregate map-side; the pair
    //      join is an equi-join on BIN (never on rows) over the
    //      bounded (type, bin) domain; non-shared bins contribute 0,
    //      so an inner join suffices. The cheap "which metrics moved
    //      together" matrix across sources/segments. ----
    QueryDef(
      "q221_hist_intersection",
      (s, d) => {
        val h = t(s, d, "events")
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT) div 1000")
              .as("bin"))
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("c"))
        val tot = h.groupBy("event_type").agg(sum(col("c")).as("tot"))
        h.select(col("event_type").as("ta"), col("bin"), col("c").as("ca"))
          .join(h.select(col("event_type").as("tb"), col("bin"),
            col("c").as("cb")), Seq("bin"))
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb")
          .agg(sum(least(col("ca"), col("cb"))).as("inter"))
          .join(broadcast(tot.select(col("event_type").as("ta"),
            col("tot").as("tot_a"))), Seq("ta"))
          .join(broadcast(tot.select(col("event_type").as("tb"),
            col("tot").as("tot_b"))), Seq("tb"))
          .select(col("ta"), col("tb"), col("inter"), col("tot_a"),
            col("tot_b"),
            expr("inter * 2000000 div (tot_a + tot_b)").as("sim_ppm"))
      },
      Some("""
        WITH h AS (
          SELECT event_type,
            CAST(round("value" * 100) AS BIGINT) // 1000 AS bin,
            COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        tot AS (
          SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot
          FROM h GROUP BY 1),
        p AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
            CAST(SUM(least(a.c, b.c)) AS BIGINT) AS inter
          FROM h a JOIN h b ON a.bin = b.bin
            AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT ta, tb, inter, x.tot AS tot_a, y.tot AS tot_b,
          inter * 2000000 // (x.tot + y.tot) AS sim_ppm
        FROM p
        JOIN tot x ON x.event_type = p.ta
        JOIN tot y ON y.event_type = p.tb""")),

    // ---- q224: dead-letter routing — the ETL quarantine shape q132's
    //      independent rule counts don't cover: every row gets exactly
    //      ONE route, the FIRST failing rule in precedence order
    //      (schema > range > freshness > ok), so route counts
    //      partition the input and the quarantine topic fan-out is
    //      deterministic. Pure per-row when-chain + one combinable
    //      aggregate; min/max example ids ride along for triage.
    //      (Rules here are deterministic demo predicates — the
    //      operator is the precedence router, not the rule set.) ----
    QueryDef(
      "q224_dead_letter_routing",
      (s, d) => {
        val route = when(col("event_id") % 11 === 0, "bad_schema")
          .when(round(col("value") * 100) > 40000L, "out_of_range")
          .when(col("event_id") % 13 === 0, "stale")
          .otherwise("ok")
        t(s, d, "events")
          .select(col("event_id"), col("event_type"), col("value"))
          .withColumn("route", route)
          .groupBy("route")
          .agg(count(lit(1)).as("n_rows"),
            min(col("event_id")).as("first_example"),
            max(col("event_id")).as("last_example"))
          .withColumn("is_quarantine",
            (col("route") =!= "ok").cast("long"))
      },
      Some("""
        WITH r AS (
          SELECT event_id,
            CASE
              WHEN event_id % 11 = 0 THEN 'bad_schema'
              WHEN round("value" * 100) > 40000 THEN 'out_of_range'
              WHEN event_id % 13 = 0 THEN 'stale'
              ELSE 'ok' END AS route
          FROM events)
        SELECT route, COUNT(*) AS n_rows,
          MIN(event_id) AS first_example,
          MAX(event_id) AS last_example,
          CAST(CASE WHEN route <> 'ok' THEN 1 ELSE 0 END AS BIGINT)
            AS is_quarantine
        FROM r GROUP BY route""")),

    // ---- q235: functional-dependency audit — data profiling's
    //      X → Y check (Metanome/HyFD territory, restricted to a
    //      declared candidate list): per candidate, how many LHS
    //      groups exist, how many carry >1 distinct RHS (violations),
    //      and the worst per-group RHS cardinality. Each candidate is
    //      one combinable two-level aggregate; the audit that decides
    //      whether a column can serve as a key, a partition dimension,
    //      or a safe denormalization source. ----
    QueryDef(
      "q235_fd_audit",
      (s, d) => {
        def fd(table: String, lhs: String, rhs: String) =
          t(s, d, table)
            .groupBy(col(lhs))
            .agg(countDistinct(col(rhs)).as("card"))
            .agg(count(lit(1)).as("n_lhs"),
              sum(when(col("card") > 1, 1L).otherwise(0L))
                .as("n_violating"),
              max(col("card")).as("max_card"))
            .select(lit(s"$table.$lhs->$rhs").as("fd"),
              col("n_lhs"), col("n_violating"), col("max_card"),
              (col("n_violating") === 0).cast("long").as("holds"))
        fd("lineitem", "l_orderkey", "l_returnflag")
          .unionByName(fd("lineitem", "l_partkey", "l_suppkey"))
          .unionByName(fd("orders", "o_custkey", "o_orderstatus"))
          .unionByName(fd("part", "p_name", "p_brand"))
          .unionByName(fd("customer", "c_custkey", "c_nationkey"))
      },
      Some("""
        WITH c1 AS (
          SELECT 'lineitem.l_orderkey->l_returnflag' AS fd,
            COUNT(*) AS n_lhs,
            CAST(SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_violating,
            CAST(MAX(card) AS BIGINT) AS max_card
          FROM (SELECT l_orderkey,
                  COUNT(DISTINCT l_returnflag) AS card
                FROM lineitem GROUP BY 1)),
        c2 AS (
          SELECT 'lineitem.l_partkey->l_suppkey',
            COUNT(*),
            CAST(SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(MAX(card) AS BIGINT)
          FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS card
                FROM lineitem GROUP BY 1)),
        c3 AS (
          SELECT 'orders.o_custkey->o_orderstatus',
            COUNT(*),
            CAST(SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(MAX(card) AS BIGINT)
          FROM (SELECT o_custkey, COUNT(DISTINCT o_orderstatus) AS card
                FROM orders GROUP BY 1)),
        c4 AS (
          SELECT 'part.p_name->p_brand',
            COUNT(*),
            CAST(SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(MAX(card) AS BIGINT)
          FROM (SELECT p_name, COUNT(DISTINCT p_brand) AS card
                FROM part GROUP BY 1)),
        c5 AS (
          SELECT 'customer.c_custkey->c_nationkey',
            COUNT(*),
            CAST(SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(MAX(card) AS BIGINT)
          FROM (SELECT c_custkey, COUNT(DISTINCT c_nationkey) AS card
                FROM customer GROUP BY 1)),
        u AS (
          SELECT * FROM c1 UNION ALL SELECT * FROM c2
          UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
          UNION ALL SELECT * FROM c5)
        SELECT fd, n_lhs, n_violating, max_card,
          CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT)
            AS holds
        FROM u""")),

    // ---- q241: quantile-binning error audit — how wrong is a
    //      64-equal-width-bin histogram's median estimate vs the exact
    //      disc percentile? Per type: the exact p50, the estimate
    //      (lower edge of the first bin whose running count reaches
    //      half), and their absolute error — the calibration that
    //      decides whether the cheap histogram path (q135/q165) can
    //      replace the exact-quantile shuffle on a given metric. The
    //      bin cumsum window runs over the BOUNDED (type, bin) domain.
    //      ----
    QueryDef(
      "q241_quantile_binning_error",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val B = 64
        val ev = t(s, d, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val rng = ev.agg(min(col("cents")).as("lo"),
          max(col("cents")).as("hi"))
        val binned = ev.crossJoin(broadcast(rng))
          .withColumn("bin",
            when(col("hi") > col("lo"),
              least(expr(s"(cents - lo) * $B div (hi - lo)"),
                lit(B - 1L))).otherwise(lit(0L)))
        val hist = binned.groupBy("event_type", "bin")
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy("event_type").orderBy("bin")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("n", sum(col("c")).over(
            Window.partitionBy("event_type")))
        val est = hist
          .filter(col("cum") * 2 >= col("n"))
          .groupBy("event_type").agg(min(col("bin")).as("med_bin"))
          .crossJoin(broadcast(rng))
          .select(col("event_type"),
            (col("lo") + expr(s"med_bin * (hi - lo) div $B"))
              .as("est_p50"))
        val exact = ev.groupBy("event_type")
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
            .cast("long").as("exact_p50"))
        exact.join(est, Seq("event_type"))
          .withColumn("abs_err", abs(col("exact_p50") - col("est_p50")))
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events),
        rng AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM ev),
        binned AS (
          SELECT event_type, cents,
            CASE WHEN hi > lo
              THEN least((cents - lo) * 64 // (hi - lo), 63)
              ELSE 0 END AS bin
          FROM ev, rng),
        hist AS (
          SELECT event_type, bin, COUNT(*) AS c FROM binned
          GROUP BY 1, 2),
        cumed AS (
          SELECT event_type, bin, c,
            CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
            CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM hist),
        est AS (
          SELECT event_type, MIN(bin) AS med_bin
          FROM cumed WHERE cum * 2 >= n GROUP BY 1),
        estv AS (
          SELECT event_type, lo + med_bin * (hi - lo) // 64 AS est_p50
          FROM est, rng),
        ex AS (
          SELECT event_type, quantile_disc(cents, 0.5) AS exact_p50
          FROM ev GROUP BY 1)
        SELECT ex.event_type, ex.exact_p50, estv.est_p50,
          abs(ex.exact_p50 - estv.est_p50) AS abs_err
        FROM ex JOIN estv ON ex.event_type = estv.event_type""")),

    // ---- q245: stratified IPW readout — the observational-data
    //      counterpart of q209's CUPED: within activity terciles
    //      (broadcast disc cuts, the q207 discipline), the treated
    //      (clicked) users' conversion rate, the stratum's population
    //      weight, and the population-standardized contribution — all
    //      in scaled integers (per-stratum ppm rates, weights in ppm),
    //      so the IPW estimate is reproducible bit-for-bit. Two keyed
    //      aggregates (user, then stratum) + one broadcast cut row.
    //      ----
    QueryDef(
      "q245_ipw_estimate",
      (s, d) => {
        val ev = t(s, d, "events")
        val users = ev.groupBy("user_id")
          .agg(
            sum((col("event_type") =!= "purchase" &&
              col("event_type") =!= "click").cast("long")).as("x"),
            max((col("event_type") === "click").cast("long"))
              .as("treated"),
            max((col("event_type") === "purchase").cast("long"))
              .as("converted"))
        val cut = users.agg(
          expr("percentile_disc(0.3333333333333333) WITHIN GROUP " +
            "(ORDER BY x)").cast("long").as("t1"),
          expr("percentile_disc(0.6666666666666666) WITHIN GROUP " +
            "(ORDER BY x)").cast("long").as("t2"))
        val strat = users.crossJoin(broadcast(cut))
          .withColumn("stratum",
            (col("x") > col("t1")).cast("long") +
              (col("x") > col("t2")).cast("long"))
        val tot = strat.agg(count(lit(1)).as("n_total"))
        strat.groupBy("stratum")
          .agg(count(lit(1)).as("n_users"),
            sum(col("treated")).as("n_treated"),
            sum(col("treated") * col("converted"))
              .as("n_conv_treated"))
          .crossJoin(broadcast(tot))
          .select(col("stratum"), col("n_users"), col("n_treated"),
            col("n_conv_treated"),
            expr("n_conv_treated * 1000000 div n_treated")
              .as("treated_rate_ppm"),
            expr("n_users * 1000000 div n_total").as("weight_ppm"),
            expr("(n_conv_treated * 1000000 div n_treated) * n_users " +
              "div n_total").as("ipw_term_ppm"))
      },
      Some("""
        WITH users AS (
          SELECT user_id,
            CAST(SUM(CASE WHEN event_type NOT IN ('purchase', 'click')
              THEN 1 ELSE 0 END) AS BIGINT) AS x,
            CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS treated,
            CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
              ELSE 0 END) AS BIGINT) AS converted
          FROM events GROUP BY 1),
        cut AS (
          SELECT quantile_disc(x, 0.3333333333333333) AS t1,
            quantile_disc(x, 0.6666666666666666) AS t2
          FROM users),
        strat AS (
          SELECT user_id, treated, converted,
            CAST((x > t1)::INT + (x > t2)::INT AS BIGINT) AS stratum
          FROM users, cut),
        tot AS (SELECT COUNT(*) AS n_total FROM strat)
        SELECT stratum, COUNT(*) AS n_users,
          CAST(SUM(treated) AS BIGINT) AS n_treated,
          CAST(SUM(treated * converted) AS BIGINT) AS n_conv_treated,
          CAST(SUM(treated * converted) AS BIGINT) * 1000000
            // CAST(SUM(treated) AS BIGINT) AS treated_rate_ppm,
          COUNT(*) * 1000000 // n_total AS weight_ppm,
          (CAST(SUM(treated * converted) AS BIGINT) * 1000000
            // CAST(SUM(treated) AS BIGINT)) * COUNT(*) // n_total
            AS ipw_term_ppm
        FROM strat, tot GROUP BY stratum, n_total""")),

    // ---- q248: cardinality-estimation audit — the System-R join-size
    //      estimate |A|·|B| / max(ndv_A, ndv_B) scored against the
    //      ACTUAL join cardinality for the three core FK joins. The
    //      estimator-error feedback loop every cost-based optimizer
    //      (and every capacity plan that trusts it) should close; the
    //      audit itself is three count/distinct aggregates plus the
    //      real joins, all integer. ----
    QueryDef(
      "q248_cardinality_audit",
      (s, d) => {
        def audit(name: String, a: DataFrame, ak: String,
            b: DataFrame, bk: String) = {
          val sa = a.agg(count(lit(1)).as("na"),
            countDistinct(col(ak)).as("da"))
          val sb = b.agg(count(lit(1)).as("nb"),
            countDistinct(col(bk)).as("db"))
          val actual = a.join(b, a(ak) === b(bk))
            .agg(count(lit(1)).as("actual"))
          sa.crossJoin(sb).crossJoin(actual)
            .select(lit(name).as("join_name"), col("na"), col("nb"),
              col("da"), col("db"),
              expr("na * nb div greatest(da, db)").as("est"),
              col("actual"))
            .withColumn("err_ppm",
              expr("abs(est - actual) * 1000000 div actual"))
        }
        audit("lineitem*orders",
            t(s, d, "lineitem"), "l_orderkey",
            t(s, d, "orders"), "o_orderkey")
          .unionByName(audit("orders*customer",
            t(s, d, "orders"), "o_custkey",
            t(s, d, "customer"), "c_custkey"))
          .unionByName(audit("lineitem*part",
            t(s, d, "lineitem"), "l_partkey",
            t(s, d, "part"), "p_partkey"))
      },
      Some("""
        WITH j1 AS (
          SELECT 'lineitem*orders' AS join_name,
            (SELECT COUNT(*) FROM lineitem) AS na,
            (SELECT COUNT(*) FROM orders) AS nb,
            (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
              FROM lineitem) AS da,
            (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
              FROM orders) AS db,
            (SELECT COUNT(*) FROM lineitem JOIN orders
              ON l_orderkey = o_orderkey) AS actual),
        j2 AS (
          SELECT 'orders*customer',
            (SELECT COUNT(*) FROM orders),
            (SELECT COUNT(*) FROM customer),
            (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
              FROM orders),
            (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
              FROM customer),
            (SELECT COUNT(*) FROM orders JOIN customer
              ON o_custkey = c_custkey)),
        j3 AS (
          SELECT 'lineitem*part',
            (SELECT COUNT(*) FROM lineitem),
            (SELECT COUNT(*) FROM part),
            (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
              FROM lineitem),
            (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT)
              FROM part),
            (SELECT COUNT(*) FROM lineitem JOIN part
              ON l_partkey = p_partkey)),
        u AS (
          SELECT * FROM j1 UNION ALL SELECT * FROM j2
          UNION ALL SELECT * FROM j3)
        SELECT join_name, na, nb, da, db,
          na * nb // greatest(da, db) AS est, actual,
          abs(na * nb // greatest(da, db) - actual) * 1000000
            // actual AS err_ppm
        FROM u""")),

    // ---- q249: distribution-free median CI — the order-statistic
    //      confidence interval (no bootstrap, no normality): indices
    //      l = ⌊(n − 1.96√n)/2⌋, u = ⌈(n + 2 + 1.96√n)/2⌉ bracket the
    //      median with ≈95% coverage by the binomial argument. sqrt /
    //      floor / ceil over identical operands are IEEE-exact, so
    //      both engines pick the IDENTICAL elements; everything
    //      shipped is an integer cent value. One type-keyed rank
    //      window + a broadcast stats row. ----
    QueryDef(
      "q249_median_ci",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
        val stats = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("lo_idx",
            greatest(lit(1L), floor(
              (col("n").cast("double") -
                lit(1.96) * sqrt(col("n").cast("double"))) / 2)
              .cast("long")))
          .withColumn("hi_idx",
            least(col("n"), ceil(
              (col("n").cast("double") + 2 +
                lit(1.96) * sqrt(col("n").cast("double"))) / 2)
              .cast("long")))
          .withColumn("mid_idx", expr("(n + 1) div 2"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("cents"), col("event_id"))
        ev.withColumn("rn", row_number().over(w).cast("long"))
          .join(broadcast(stats), Seq("event_type"))
          .filter(col("rn") === col("lo_idx") ||
            col("rn") === col("mid_idx") || col("rn") === col("hi_idx"))
          .groupBy("event_type")
          .agg(first(col("n")).as("n"),
            max(when(col("rn") === col("lo_idx"), col("cents")))
              .as("ci_lo_cents"),
            max(when(col("rn") === col("mid_idx"), col("cents")))
              .as("median_cents"),
            max(when(col("rn") === col("hi_idx"), col("cents")))
              .as("ci_hi_cents"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, event_id,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events),
        st AS (
          SELECT event_type, COUNT(*) AS n,
            greatest(1, CAST(floor((COUNT(*) - 1.96 * sqrt(COUNT(*)))
              / 2) AS BIGINT)) AS lo_idx,
            least(COUNT(*), CAST(ceil((COUNT(*) + 2
              + 1.96 * sqrt(COUNT(*))) / 2) AS BIGINT)) AS hi_idx,
            (COUNT(*) + 1) // 2 AS mid_idx
          FROM ev GROUP BY 1),
        r AS (
          SELECT event_type, cents,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY cents, event_id) AS BIGINT) AS rn
          FROM ev)
        SELECT r.event_type, MAX(st.n) AS n,
          MAX(CASE WHEN rn = lo_idx THEN cents END) AS ci_lo_cents,
          MAX(CASE WHEN rn = mid_idx THEN cents END) AS median_cents,
          MAX(CASE WHEN rn = hi_idx THEN cents END) AS ci_hi_cents
        FROM r JOIN st ON r.event_type = st.event_type
        WHERE rn = lo_idx OR rn = mid_idx OR rn = hi_idx
        GROUP BY r.event_type""")),

    // ---- q253: shuffle-partition advisor — turn the q137-style key
    //      stats into the CONFIG a job should run with: estimated
    //      shuffle bytes (rows × a declared row-width constant),
    //      recommended partition count at a 64 MiB target, and the
    //      count of keys whose single-key volume exceeds one
    //      partition's budget — the keys that need salting BEFORE the
    //      job, not after it spills. One combinable key aggregate +
    //      one summary row. ----
    QueryDef(
      "q253_shuffle_advisor",
      (s, d) => {
        val RowBytes = 64L
        val Target = 67108864L // 64 MiB
        val per = t(s, d, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n"))
          .withColumn("key_bytes", col("n") * RowBytes)
        per.agg(count(lit(1)).as("n_keys"),
            sum(col("n")).as("n_rows"),
            sum(col("key_bytes")).as("est_bytes"),
            max(col("key_bytes")).as("max_key_bytes"))
          .withColumn("rec_partitions",
            greatest(lit(1L), expr(s"(est_bytes + $Target - 1) div $Target")))
          .withColumn("n_salt_keys",
            lit(0L)) // placeholder replaced below via join
          .drop("n_salt_keys")
          .crossJoin(broadcast(per
            .agg(sum((col("key_bytes") >
              Target).cast("long")).as("n_salt_keys"))))
      },
      Some("""
        WITH per AS (
          SELECT user_id, COUNT(*) AS n, COUNT(*) * 64 AS key_bytes
          FROM events GROUP BY 1),
        s AS (
          SELECT COUNT(*) AS n_keys,
            CAST(SUM(n) AS BIGINT) AS n_rows,
            CAST(SUM(key_bytes) AS BIGINT) AS est_bytes,
            CAST(MAX(key_bytes) AS BIGINT) AS max_key_bytes
          FROM per),
        k AS (
          SELECT CAST(SUM(CASE WHEN key_bytes > 67108864 THEN 1
            ELSE 0 END) AS BIGINT) AS n_salt_keys
          FROM per)
        SELECT n_keys, n_rows, est_bytes, max_key_bytes,
          greatest(1, (est_bytes + 67108863) // 67108864)
            AS rec_partitions,
          n_salt_keys
        FROM s, k""")),

    // ---- q258: Wald–Wolfowitz runs test — is the above/below-median
    //      sign sequence random, or does the metric streak? Signs come
    //      from the disc median (element-picked), runs from the q203
    //      gaps-and-islands count, and the expected-runs formula
    //      2·n₁·n₂/n + 1 ships as exact integer cross-products (the
    //      consumer divides). Completes the q61/q68/q191 test family
    //      with the SEQUENCE-randomness axis those value tests can't
    //      see. One keyed window + combinable aggregates. ----
    QueryDef(
      "q258_runs_test",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .select(col("event_type"), col("ts"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
        val med = ev.groupBy("event_type")
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
            .cast("long").as("med"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("event_id"))
        val signed = ev.join(broadcast(med), Seq("event_type"))
          .withColumn("sgn", (col("cents") > col("med")).cast("int"))
          .withColumn("brk",
            when(lag(col("sgn"), 1).over(w).isNull ||
              col("sgn") =!= lag(col("sgn"), 1).over(w), 1L)
              .otherwise(0L))
        signed.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("sgn").cast("long")).as("n_above"),
            sum(col("brk")).as("n_runs"))
          .withColumn("n_below", col("n") - col("n_above"))
          .withColumn("exp_runs_num",
            lit(2L) * col("n_above") * col("n_below") + col("n"))
          .select(col("event_type"), col("n"), col("n_above"),
            col("n_below"), col("n_runs"), col("exp_runs_num"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, epoch_us(ts) AS ts, event_id,
            CAST(round("value" * 100) AS BIGINT) AS cents
          FROM events),
        med AS (
          SELECT event_type, quantile_disc(cents, 0.5) AS med
          FROM ev GROUP BY 1),
        sg AS (
          SELECT ev.event_type, ts, event_id,
            CASE WHEN cents > med THEN 1 ELSE 0 END AS sgn
          FROM ev JOIN med ON ev.event_type = med.event_type),
        b AS (
          SELECT event_type, sgn,
            CASE WHEN lag(sgn) OVER w IS NULL
                   OR sgn <> lag(sgn) OVER w THEN 1 ELSE 0 END AS brk
          FROM sg
          WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(sgn) AS BIGINT) AS n_above,
          COUNT(*) - CAST(SUM(sgn) AS BIGINT) AS n_below,
          CAST(SUM(brk) AS BIGINT) AS n_runs,
          2 * CAST(SUM(sgn) AS BIGINT)
            * (COUNT(*) - CAST(SUM(sgn) AS BIGINT)) + COUNT(*)
            AS exp_runs_num
        FROM b GROUP BY event_type""")),

    // ---- q260: XmR control chart (individuals + moving range) — the
    //      SPC chart over the daily metric: center line and control
    //      limits x̄ ± 2.66·m̄R from exact integer sums (two single
    //      IEEE expressions), each day flagged against them. The
    //      manufacturing-grade "is this variation special or common
    //      cause" gate, cheaper and more principled than ad-hoc
    //      z-score thresholds on autocorrelated dailies. One bounded
    //      day-domain window per type. ----
    QueryDef(
      "q260_xmr_chart",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val DayUs = 86400000000L
        val daily = t(s, d, "events")
          .select(col("event_type"), expr(s"ts div $DayUs").as("day"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy("event_type", "day")
          .agg(sum(col("c")).as("x"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val withMr = daily
          .withColumn("mr", abs(col("x") - lag(col("x"), 1).over(w)))
        val stats = withMr.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(col("x")).as("sx"),
            sum(col("mr")).as("smr"),
            count(col("mr")).as("n_mr"))
          .withColumn("center",
            col("sx").cast("double") / col("n_days").cast("double"))
          .withColumn("mrbar",
            col("smr").cast("double") / col("n_mr").cast("double"))
        withMr.join(broadcast(stats), Seq("event_type"))
          .withColumn("ucl", col("center") + lit(2.66) * col("mrbar"))
          .withColumn("lcl", col("center") - lit(2.66) * col("mrbar"))
          .groupBy("event_type")
          .agg(first(col("n_days")).as("n_days"),
            first(col("center")).as("center"),
            first(col("ucl")).as("ucl"),
            first(col("lcl")).as("lcl"),
            sum((col("x").cast("double") > col("ucl")).cast("long"))
              .as("n_above_ucl"),
            sum((col("x").cast("double") < col("lcl")).cast("long"))
              .as("n_below_lcl"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
              AS x
          FROM events GROUP BY 1, 2),
        m AS (
          SELECT event_type, day, x,
            abs(x - lag(x) OVER (PARTITION BY event_type
              ORDER BY day)) AS mr
          FROM daily),
        st AS (
          SELECT event_type, COUNT(*) AS n_days,
            CAST(SUM(x) AS BIGINT) AS sx,
            CAST(SUM(mr) AS BIGINT) AS smr,
            COUNT(mr) AS n_mr
          FROM m GROUP BY 1),
        s2 AS (
          SELECT event_type, n_days,
            CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS center,
            CAST(smr AS DOUBLE) / CAST(n_mr AS DOUBLE) AS mrbar
          FROM st)
        SELECT m.event_type, MAX(s2.n_days) AS n_days,
          MAX(center) AS center,
          MAX(center + 2.66 * mrbar) AS ucl,
          MAX(center - 2.66 * mrbar) AS lcl,
          CAST(SUM(CASE WHEN CAST(x AS DOUBLE)
            > center + 2.66 * mrbar THEN 1 ELSE 0 END) AS BIGINT)
            AS n_above_ucl,
          CAST(SUM(CASE WHEN CAST(x AS DOUBLE)
            < center - 2.66 * mrbar THEN 1 ELSE 0 END) AS BIGINT)
            AS n_below_lcl
        FROM m JOIN s2 ON m.event_type = s2.event_type
        GROUP BY m.event_type""")),



    // ---- q278: Chapman capture-recapture — estimate the TRUE
    //      population each source only partially observes (the
    //      data-coverage question a crawler/ingest pipeline asks:
    //      "how many entities exist that NEITHER window saw?"):
    //      two observation windows (first/last third of the time
    //      range), N̂ = (nA+1)(nB+1)/(m+1) − 1 from the overlap m,
    //      as exact integer numerator/denominator plus the floor
    //      estimate — compared against the in-sample ground truth
    //      n_true. Three distinct-user aggregates per type, one
    //      broadcast range row; no window. ----
    QueryDef(
      "q278_capture_recapture",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"),
          col("user_id"), col("ts"))
        val rng = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        val tagged = ev.crossJoin(broadcast(rng))
          .withColumn("w",
            when(col("ts") * 3 <= col("lo") * 2 + col("hi"), 1L)
              .when(col("ts") * 3 >= col("lo") + col("hi") * 2, 2L)
              .otherwise(0L))
        val a = tagged.filter(col("w") === 1)
          .select("event_type", "user_id").distinct()
        val b = tagged.filter(col("w") === 2)
          .select("event_type", "user_id").distinct()
        val na = a.groupBy("event_type").agg(count(lit(1)).as("n_a"))
        val nb = b.groupBy("event_type").agg(count(lit(1)).as("n_b"))
        val m = a.join(b, Seq("event_type", "user_id"))
          .groupBy("event_type").agg(count(lit(1)).as("m"))
        val tru = ev.select("event_type", "user_id").distinct()
          .groupBy("event_type").agg(count(lit(1)).as("n_true"))
        na.join(nb, Seq("event_type")).join(m, Seq("event_type"))
          .join(tru, Seq("event_type"))
          .withColumn("chapman_est",
            expr("(n_a + 1) * (n_b + 1) div (m + 1) - 1"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, user_id, epoch_us(ts) AS tsu FROM events),
        rng AS (SELECT MIN(tsu) AS lo, MAX(tsu) AS hi FROM ev),
        tagged AS (
          SELECT event_type, user_id,
            CASE WHEN tsu * 3 <= lo * 2 + hi THEN 1
              WHEN tsu * 3 >= lo + hi * 2 THEN 2 ELSE 0 END AS w
          FROM ev, rng),
        a AS (SELECT DISTINCT event_type, user_id FROM tagged
          WHERE w = 1),
        b AS (SELECT DISTINCT event_type, user_id FROM tagged
          WHERE w = 2),
        na AS (SELECT event_type, COUNT(*) AS n_a FROM a GROUP BY 1),
        nb AS (SELECT event_type, COUNT(*) AS n_b FROM b GROUP BY 1),
        m AS (
          SELECT a.event_type, COUNT(*) AS m
          FROM a JOIN b ON a.event_type = b.event_type
            AND a.user_id = b.user_id
          GROUP BY 1),
        tru AS (
          SELECT event_type, COUNT(DISTINCT user_id) AS n_true
          FROM ev GROUP BY 1)
        SELECT na.event_type, n_a, n_b, m, n_true,
          (n_a + 1) * (n_b + 1) // (m + 1) - 1 AS chapman_est
        FROM na JOIN nb ON na.event_type = nb.event_type
        JOIN m ON na.event_type = m.event_type
        JOIN tru ON na.event_type = tru.event_type""")),

    // ---- q287: leave-one-out target encoding — the feature-
    //      engineering operator whose naive form LEAKS the label:
    //      encoding a row's category by the group mean INCLUDING the
    //      row itself lets the model read its own target. The
    //      leakage-free form excludes the row: enc_i = (S_g − x_i) /
    //      (n_g − 1), shipped as exact integer numerator/denominator
    //      per row (consumers divide; singleton groups yield den = 0
    //      → NULL encoding, surfaced not hidden). One group
    //      aggregate broadcast back over the scan — no window, no
    //      self-join. ----
    QueryDef(
      "q287_loo_encoding",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100).cast("long").as("x"))
        val g = ev.groupBy("event_type")
          .agg(sum(col("x")).as("sg"), count(lit(1)).as("ng"))
        ev.join(broadcast(g), Seq("event_type"))
          .select(col("event_id"), col("event_type"),
            (col("sg") - col("x")).as("enc_num"),
            (col("ng") - 1L).as("enc_den"),
            when(col("ng") > 1,
              (col("sg") - col("x")).cast("double") /
                (col("ng") - 1L).cast("double")).as("enc"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id, event_type,
            CAST(round("value" * 100) AS BIGINT) AS x
          FROM events),
        g AS (
          SELECT event_type, CAST(SUM(x) AS BIGINT) AS sg,
            COUNT(*) AS ng
          FROM ev GROUP BY 1)
        SELECT event_id, ev.event_type, sg - x AS enc_num,
          ng - 1 AS enc_den,
          CASE WHEN ng > 1 THEN CAST(sg - x AS DOUBLE)
            / CAST(ng - 1 AS DOUBLE) END AS enc
        FROM ev JOIN g ON ev.event_type = g.event_type""")),

    // ---- q288: effective sample size — the importance-sampling
    //      diagnostic for any weighted mixture (q94/q95/q96 build
    //      them): ESS = (Σw)²/Σw² over per-source token weights, as
    //      exact integer numerator/denominator plus the one-division
    //      float — ESS ≪ n_sources means a few sources dominate and
    //      the mixture behaves like far fewer independent sources.
    //      Ships next to the max-share and the n_sources ceiling. ----
    QueryDef(
      "q288_ess_mixture",
      (s, d) => {
        t(s, d, "documents")
          .select(col("source"),
            size(graft.functions.TextFunctions.tokens(col("text")))
              .cast("long").as("nt"))
          .groupBy("source").agg(sum(col("nt")).as("w"))
          .agg(count(lit(1)).as("n_sources"), sum(col("w")).as("sw"),
            sum(col("w") * col("w")).as("sww"), max(col("w")).as("max_w"))
          .withColumn("ess_num", col("sw") * col("sw"))
          .withColumn("ess", col("ess_num").cast("double") /
            col("sww").cast("double"))
          .withColumn("max_share_ppm", expr("max_w * 1000000 div sw"))
      },
      Some("""
        WITH w AS (
          SELECT source,
            CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS w
          FROM documents GROUP BY 1),
        ag AS (
          SELECT COUNT(*) AS n_sources, CAST(SUM(w) AS BIGINT) AS sw,
            CAST(SUM(w * w) AS BIGINT) AS sww,
            CAST(MAX(w) AS BIGINT) AS max_w
          FROM w)
        SELECT n_sources, sw, sww, max_w, sw * sw AS ess_num,
          CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE) AS ess,
          max_w * 1000000 // sw AS max_share_ppm
        FROM ag""")),

    // ---- q290: split-conformal calibration — distribution-free
    //      prediction intervals from a held-out calibration set: the
    //      "model" is the per-type median, the conformity score is
    //      |x − med|, q̂ is the calibration half's disc-quantile at
    //      0.9 (element-picking → int64), and the EVAL half reports
    //      achieved coverage in exact ppm. Split by event_id parity —
    //      deterministic, disjoint, engine-agnostic. The conformal
    //      guarantee says eval coverage ≈ 90% regardless of the
    //      distribution; the audit row is how far reality lands from
    //      it. Two grouped aggregates + broadcast join-backs. ----
    QueryDef(
      "q290_conformal_coverage",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("x"))
        val med = ev.groupBy("event_type")
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)")
            .cast("long").as("med"))
        val scored = ev.join(broadcast(med), Seq("event_type"))
          .withColumn("resid", abs(col("x") - col("med")))
          .withColumn("cal", col("event_id") % 2 === 0)
        val qhat = scored.filter(col("cal"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_cal"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY resid)")
              .cast("long").as("qhat"))
        scored.filter(!col("cal"))
          .join(broadcast(qhat), Seq("event_type"))
          .groupBy("event_type")
          .agg(max(col("n_cal")).as("n_cal"),
            max(col("qhat")).as("qhat"),
            count(lit(1)).as("n_eval"),
            sum(when(col("resid") <= col("qhat"), 1L).otherwise(0L))
              .as("n_covered"))
          .withColumn("coverage_ppm",
            expr("n_covered * 1000000 div n_eval"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, event_id,
            CAST(round("value" * 100) AS BIGINT) AS x
          FROM events),
        med AS (
          SELECT event_type, quantile_disc(x, 0.5) AS med
          FROM ev GROUP BY 1),
        scored AS (
          SELECT ev.event_type, abs(x - med) AS resid,
            event_id % 2 = 0 AS cal
          FROM ev JOIN med ON ev.event_type = med.event_type),
        qh AS (
          SELECT event_type, COUNT(*) AS n_cal,
            quantile_disc(resid, 0.9) AS qhat
          FROM scored WHERE cal GROUP BY 1)
        SELECT s.event_type, MAX(n_cal) AS n_cal, MAX(qhat) AS qhat,
          COUNT(*) AS n_eval,
          CAST(SUM(CASE WHEN resid <= qhat THEN 1 ELSE 0 END)
            AS BIGINT) AS n_covered,
          CAST(SUM(CASE WHEN resid <= qhat THEN 1 ELSE 0 END)
            AS BIGINT) * 1000000 // COUNT(*) AS coverage_ppm
        FROM scored s JOIN qh ON s.event_type = qh.event_type
        WHERE NOT cal GROUP BY 1""")),

    // ---- q270: Wilson lower bound — rate ranking that small samples
    //      can't game (a 1/1 success never outranks 80/100): the 95%
    //      Wilson score interval's lower endpoint per event_type over
    //      the exact integer (k successes, n trials), evaluated with
    //      ONE shared float expression — identical operation order on
    //      both engines, so IEEE determinism carries the hash (the
    //      XmR-chart float discipline). Single combinable aggregate. ----
    QueryDef(
      "q270_wilson_ranking",
      (s, d) => {
        val z2 = 3.8416 // 1.96² — same literal both engines
        t(s, d, "events")
          .select(col("event_type"),
            (round(col("value") * 100).cast("long") > 5000L)
              .cast("long").as("succ"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("succ")).as("k"))
          .withColumn("wilson_lb", expr(s"""
            (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + $z2 / (2.0 * CAST(n AS DOUBLE))
              - 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                  * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  + $z2 / (4.0 * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)))
              / (1.0 + $z2 / CAST(n AS DOUBLE))"""))
      },
      Some("""
        WITH ag AS (
          SELECT event_type, COUNT(*) AS n,
            CAST(SUM(CASE WHEN CAST(round("value" * 100) AS BIGINT)
              > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS k
          FROM events GROUP BY 1)
        SELECT event_type, n, k,
          (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + 3.8416 / (2.0 * CAST(n AS DOUBLE))
            - 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                + 3.8416 / (4.0 * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)))
            / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS wilson_lb
        FROM ag""")),

    // ---- q292: Gini decision stump — the single best binary split
    //      "feature <= v" per feature, the feature-selection /
    //      shallow-tree primitive a training pipeline runs to rank
    //      signals against a label (here: event is a purchase).
    //      Pipeline: melt 3 integer-exact features (value cents,
    //      hour-of-day, day-of-week — all pure epoch-µs arithmetic,
    //      no timezone functions), pre-aggregate to (feature, value)
    //      grain, then ONE PrefixScan per feature gives every
    //      candidate split's left-side (n_l, pos_l) without an
    //      unpartitioned window — candidates per feature are distinct
    //      values, and the banded scan keeps the sort parallel. The
    //      split score minimizes n_l·Gini_L + n_r·Gini_R =
    //      (n_l² − pos_l² − neg_l²)/n_l + (…R…) — one shared float
    //      expression of exact integers (+,−,×,÷ are IEEE
    //      correctly-rounded, so both engines produce identical
    //      bits); argmin per feature is a struct-min aggregate,
    //      deterministically tie-broken by threshold. The DuckDB
    //      oracle is a plain global window over the same grain —
    //      hash equality certifies the banded scan AND the stump
    //      algebra at once. ----
    QueryDef(
      "q292_gini_stump",
      (s, d) => {
        val giniExpr =
          "CAST(n_l*n_l - pos_l*pos_l - (n_l-pos_l)*(n_l-pos_l) AS DOUBLE)" +
            " / CAST(n_l AS DOUBLE)" +
            " + CAST(n_r*n_r - pos_r*pos_r - (n_r-pos_r)*(n_r-pos_r) AS DOUBLE)" +
            " / CAST(n_r AS DOUBLE)"
        val ev = t(s, d, "events").filter(col("value").isNotNull)
          .select(
            expr("CAST(floor(value * 100) AS BIGINT)").as("f_cents"),
            expr("(ts div 3600000000) % 24").as("f_hour"),
            expr("((ts div 86400000000) + 4) % 7").as("f_dow"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("pos"))
        val features = Seq("cents", "hour", "dow")
        // deliberately kept as a 3-branch union: the branches are
        // independent single-column scans that run as CONCURRENT
        // stages; an explode-based single-scan melt was A/B-measured
        // SLOWER at sf0.1 (4.15 → 4.60 s) and was reverted.
        val melted = features.zip(Seq("f_cents", "f_hour", "f_dow"))
          .map { case (nm, c) =>
            ev.select(lit(nm).as("feature"), col(c).as("x"), col("pos"))
          }.reduce(_.unionByName(_))
        val g = melted.groupBy("feature", "x")
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p1"))
          // composite order key: feature index in the high bits, so ONE
          // banded scan serves all three features (3 scans = 3× the
          // cuts/window/totals stage overhead for the same data); the
          // feature offset is folded back out below. |x| < 2^41 by
          // domain (cents of bounded doubles; hour/dow tiny).
          .withColumn("fidx",
            when(col("feature") === features(0), 0L)
              .when(col("feature") === features(1), 1L).otherwise(2L))
          .withColumn("k",
            col("fidx") * lit(1L << 42) + col("x") + lit(1L << 41))
          .persist()
        val scanned = PrefixScan.runningSums(g, "k", Nil,
          Seq("cnt" -> "cum_n", "p1" -> "cum_p")).drop("scan_band")
        // per-feature exclusive offsets off the 3-row totals — the same
        // bounded-collect fold PrefixScan applies to its band totals
        val tot = g.groupBy("fidx", "feature")
          .agg(sum(col("cnt")).as("n"), sum(col("p1")).as("pos"))
        val totRows = tot.collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).sortBy(_._1)
        val offs = totRows.map(_._1).zip(
          totRows.scanLeft((0L, 0L)) { case ((a, b), (_, _, n, p)) =>
            (a + n, b + p) }.dropRight(1))
        val (offN, offP) = offs.foldLeft((lit(0L), lit(0L))) {
          case ((en, ep), (f, (on, op))) =>
            (when(col("fidx") === f, lit(on)).otherwise(en),
              when(col("fidx") === f, lit(op)).otherwise(ep))
        }
        val out = scanned
          .withColumn("n_l", col("cum_n") - offN)
          .withColumn("pos_l", col("cum_p") - offP)
          .join(broadcast(tot.drop("fidx")), Seq("feature"))
          .filter(col("n_l") < col("n"))
          .withColumn("n_r", col("n") - col("n_l"))
          .withColumn("pos_r", col("pos") - col("pos_l"))
          .withColumn("impurity", expr(giniExpr))
          .groupBy("feature")
          .agg(min(struct(col("impurity"), col("x"), col("n_l"),
            col("pos_l"), col("n_r"), col("pos_r"), col("n"),
            col("pos"))).as("b"))
          .select(col("feature"), col("b.x").as("best_thr"),
            col("b.impurity").as("impurity"), col("b.n_l").as("n_l"),
            col("b.pos_l").as("pos_l"), col("b.n_r").as("n_r"),
            col("b.pos_r").as("pos_r"), col("b.n").as("n"),
            col("b.pos").as("pos"))
        // g stays cached through the caller's action (the totals
        // collect above already materialized it; unpersisting here
        // would force the final action to recompute the pre-agg) —
        // Verify/Bench clearCache() per query.
        out
      },
      Some("""
        WITH e AS (
          SELECT CAST(floor("value" * 100) AS BIGINT) AS f_cents,
            (epoch_us(ts) // 3600000000) % 24 AS f_hour,
            ((epoch_us(ts) // 86400000000) + 4) % 7 AS f_dow,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
          FROM events WHERE "value" IS NOT NULL),
        m AS (
          SELECT 'cents' AS feature, f_cents AS x, pos FROM e
          UNION ALL SELECT 'hour', f_hour, pos FROM e
          UNION ALL SELECT 'dow', f_dow, pos FROM e),
        g AS (
          SELECT feature, x, COUNT(*) AS cnt,
            CAST(SUM(pos) AS BIGINT) AS p1
          FROM m GROUP BY 1, 2),
        c AS (
          SELECT feature, x,
            CAST(SUM(cnt) OVER (PARTITION BY feature ORDER BY x)
              AS BIGINT) AS n_l,
            CAST(SUM(p1) OVER (PARTITION BY feature ORDER BY x)
              AS BIGINT) AS pos_l,
            CAST(SUM(cnt) OVER (PARTITION BY feature) AS BIGINT) AS n,
            CAST(SUM(p1) OVER (PARTITION BY feature) AS BIGINT) AS pos
          FROM g),
        cand AS (
          SELECT feature, x AS best_thr, n, pos, n_l, pos_l,
            n - n_l AS n_r, pos - pos_l AS pos_r
          FROM c WHERE n_l < n),
        scored AS (
          SELECT *,
            CAST(n_l*n_l - pos_l*pos_l - (n_l-pos_l)*(n_l-pos_l)
                AS DOUBLE) / CAST(n_l AS DOUBLE)
              + CAST(n_r*n_r - pos_r*pos_r - (n_r-pos_r)*(n_r-pos_r)
                AS DOUBLE) / CAST(n_r AS DOUBLE) AS impurity
          FROM cand)
        SELECT feature, best_thr, impurity, n_l, pos_l, n_r, pos_r,
          n, pos
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY feature
          ORDER BY impurity, best_thr) = 1""")),

    // ---- q293: chi-square contingency audit — per-cell
    //      independence diagnostics for day-of-week × event_type.
    //      Emits the full contingency table with margins and each
    //      cell's chi-square contribution (n·O − r·c)²/(r·c·n):
    //      the drill-down a drift monitor reads to see WHICH cell
    //      breaks independence, not just that the statistic moved.
    //      All counts are exact integers off one scan; margins are
    //      two tiny broadcast joins plus a one-row total (the same
    //      scalar-attach shape as q54); the contribution is one
    //      shared float expression of exact integers — bit-identical
    //      cross-engine. Per-cell rows deliberately avoid a
    //      double-typed SUM across cells, which would be
    //      partition-order-dependent. ----
    QueryDef(
      "q293_chi2_contingency",
      (s, d) => {
        val e = t(s, d, "events")
          .select(expr("((ts div 86400000000) + 4) % 7").as("dow"),
            col("event_type"))
        val o = e.groupBy("dow", "event_type")
          .agg(count(lit(1)).as("obs")).persist()
        val r = o.groupBy("dow").agg(sum(col("obs")).as("r_tot"))
        val c = o.groupBy("event_type").agg(sum(col("obs")).as("c_tot"))
        val n = o.agg(sum(col("obs")).as("n"))
        val out = o.join(broadcast(r), Seq("dow"))
          .join(broadcast(c), Seq("event_type"))
          .crossJoin(broadcast(n))
          .withColumn("contrib", expr(
            "CAST(n*obs - r_tot*c_tot AS DOUBLE)" +
              " * CAST(n*obs - r_tot*c_tot AS DOUBLE)" +
              " / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)" +
              " * CAST(n AS DOUBLE))"))
          .select("dow", "event_type", "obs", "r_tot", "c_tot", "n",
            "contrib")
        o.unpersist()
        out
      },
      Some("""
        WITH e AS (
          SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
            event_type
          FROM events),
        o AS (
          SELECT dow, event_type, COUNT(*) AS obs FROM e GROUP BY 1, 2),
        r AS (
          SELECT dow, CAST(SUM(obs) AS BIGINT) AS r_tot
          FROM o GROUP BY 1),
        c AS (
          SELECT event_type, CAST(SUM(obs) AS BIGINT) AS c_tot
          FROM o GROUP BY 1),
        t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o)
        SELECT o.dow, o.event_type, o.obs, r.r_tot, c.c_tot, t.n,
          CAST(t.n*o.obs - r.r_tot*c.c_tot AS DOUBLE)
            * CAST(t.n*o.obs - r.r_tot*c.c_tot AS DOUBLE)
            / (CAST(r.r_tot AS DOUBLE) * CAST(c.c_tot AS DOUBLE)
            * CAST(t.n AS DOUBLE)) AS contrib
        FROM o JOIN r USING (dow) JOIN c USING (event_type)
          CROSS JOIN t""")),

    // ---- q300: exact global ROC-AUC via the rank identity — AUC of
    //      "does spend predict purchase" computed without
    //      approximation: AUC = U/(n⁺·n⁻) with
    //      U = Σranks⁺ − n⁺(n⁺+1)/2 (Mann-Whitney), using AVERAGE
    //      ranks for ties so the estimate is the proper tie-corrected
    //      one. Twice the tied-average rank of a score block is the
    //      integer 2·cum_n − cnt + 1, so 2·Σranks⁺ (and hence
    //      u2 = 2U) is an exact int64 — the only float is the final
    //      shared division. The global rank comes from ONE PrefixScan
    //      over the (score → count, positives) pre-aggregate: banded,
    //      never a single-partition window, candidates = distinct
    //      scores regardless of corpus size. ----
    QueryDef(
      "q300_exact_auc",
      (s, d) => {
        val g = t(s, d, "events").filter(col("value").isNotNull)
          .select(expr("CAST(floor(value * 100) AS BIGINT)").as("score"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("pos"))
          .groupBy("score")
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p1"))
        PrefixScan.runningSums(g, "score", Nil,
          Seq("cnt" -> "cum_n", "p1" -> "cum_p")).drop("scan_band")
          .agg(sum(col("p1")).as("n_pos"),
            sum(col("cnt") - col("p1")).as("n_neg"),
            sum(expr("p1 * (2 * cum_n - cnt + 1)")).as("ranks2_pos"))
          .withColumn("u2", expr("ranks2_pos - n_pos * (n_pos + 1)"))
          .withColumn("auc", expr("CAST(u2 AS DOUBLE)" +
            " / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"))
          .select("n_pos", "n_neg", "u2", "auc")
      },
      Some("""
        WITH e AS (
          SELECT CAST(floor("value" * 100) AS BIGINT) AS score,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
          FROM events WHERE "value" IS NOT NULL),
        g AS (
          SELECT score, COUNT(*) AS cnt,
            CAST(SUM(pos) AS BIGINT) AS p1
          FROM e GROUP BY 1),
        c AS (
          SELECT *, CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT)
            AS cum_n
          FROM g),
        a AS (
          SELECT CAST(SUM(p1) AS BIGINT) AS n_pos,
            CAST(SUM(cnt - p1) AS BIGINT) AS n_neg,
            CAST(SUM(p1 * (2 * cum_n - cnt + 1)) AS BIGINT)
              AS ranks2_pos
          FROM c)
        SELECT n_pos, n_neg,
          ranks2_pos - n_pos * (n_pos + 1) AS u2,
          CAST(ranks2_pos - n_pos * (n_pos + 1) AS DOUBLE)
            / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
            AS auc
        FROM a""")),

    // ---- q309: per-group multivariate OLS via Cramer's rule —
    //      two regressors + intercept (spend ~ hour-of-day +
    //      day-of-week per event type), q181's simple-regression
    //      big sibling. The nine sufficient statistics (n, Σx1, Σx2,
    //      Σx1², Σx2², Σx1x2, Σy, Σx1y, Σx2y) are exact int64 off
    //      ONE combinable aggregate (regressors shifted to hour−12 /
    //      dow−3 for headroom); the 3×3 normal-equation determinants
    //      are degree-4 in those sums — past int64 at this n — so
    //      they ride ONE shared float expression tree (the q270
    //      discipline: +,−,× on exact integers are correctly rounded
    //      and bit-identical cross-engine). OlsSpec pins the algebra
    //      on planted y = 3 + 2·x1 − x2 data, where every Cramer
    //      product is < 2^53 and the recovered coefficients are
    //      exact. ----
    QueryDef(
      "q309_group_ols2",
      (s, d) => {
        import Validation.{OlsDet => det, OlsB0n => b0n,
          OlsB1n => b1n, OlsB2n => b2n}
        t(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("(ts div 3600000000) % 24 - 12").as("x1"),
            expr("((ts div 86400000000) + 4) % 7 - 3").as("x2"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
            sum(expr("x1 * x1")).as("s11"),
            sum(expr("x2 * x2")).as("s22"),
            sum(expr("x1 * x2")).as("s12"),
            sum(col("y")).as("sy"),
            sum(expr("x1 * y")).as("s1y"),
            sum(expr("x2 * y")).as("s2y"))
          .withColumn("nd", expr("CAST(n AS DOUBLE)"))
          .withColumn("sx1d", expr("CAST(sx1 AS DOUBLE)"))
          .withColumn("sx2d", expr("CAST(sx2 AS DOUBLE)"))
          .withColumn("syd", expr("CAST(sy AS DOUBLE)"))
          .withColumn("det", expr(det))
          .withColumn("b0", expr(s"$b0n / $det"))
          .withColumn("b1", expr(s"$b1n / $det"))
          .withColumn("b2", expr(s"$b2n / $det"))
          .select("event_type", "n", "sx1", "sx2", "s11", "s22", "s12",
            "sy", "s1y", "s2y", "det", "b0", "b1", "b2")
      },
      Some("""
        WITH e AS (
          SELECT event_type,
            (epoch_us(ts) // 3600000000) % 24 - 12 AS x1,
            ((epoch_us(ts) // 86400000000) + 4) % 7 - 3 AS x2,
            CAST(floor("value" * 100) AS BIGINT) AS y
          FROM events WHERE "value" IS NOT NULL),
        g AS (
          SELECT event_type, COUNT(*) AS n,
            CAST(SUM(x1) AS BIGINT) AS sx1,
            CAST(SUM(x2) AS BIGINT) AS sx2,
            CAST(SUM(x1 * x1) AS BIGINT) AS s11,
            CAST(SUM(x2 * x2) AS BIGINT) AS s22,
            CAST(SUM(x1 * x2) AS BIGINT) AS s12,
            CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x1 * y) AS BIGINT) AS s1y,
            CAST(SUM(x2 * y) AS BIGINT) AS s2y
          FROM e GROUP BY 1),
        w AS (SELECT *, CAST(n AS DOUBLE) AS nd,
          CAST(sx1 AS DOUBLE) AS sx1d, CAST(sx2 AS DOUBLE) AS sx2d,
          CAST(sy AS DOUBLE) AS syd FROM g)
        SELECT event_type, n, sx1, sx2, s11, s22, s12, sy, s1y, s2y,
          (nd * (s11 * s22 - s12 * s12)
            - sx1d * (sx1 * s22 - s12 * sx2)
            + sx2d * (sx1 * s12 - s11 * sx2)) AS det,
          (syd * (s11 * s22 - s12 * s12)
            - sx1d * (s1y * s22 - s12 * s2y)
            + sx2d * (s1y * s12 - s11 * s2y))
            / (nd * (s11 * s22 - s12 * s12)
              - sx1d * (sx1 * s22 - s12 * sx2)
              + sx2d * (sx1 * s12 - s11 * sx2)) AS b0,
          (nd * (s1y * s22 - s12 * s2y)
            - syd * (sx1 * s22 - s12 * sx2)
            + sx2d * (sx1 * s2y - s1y * sx2))
            / (nd * (s11 * s22 - s12 * s12)
              - sx1d * (sx1 * s22 - s12 * sx2)
              + sx2d * (sx1 * s12 - s11 * sx2)) AS b1,
          (nd * (s11 * s2y - s1y * s12)
            - sx1d * (sx1 * s2y - s1y * sx2)
            + syd * (sx1 * s12 - s11 * sx2))
            / (nd * (s11 * s22 - s12 * s12)
              - sx1d * (sx1 * s22 - s12 * sx2)
              + sx2d * (sx1 * s12 - s11 * sx2)) AS b2
        FROM w""")),

    // ---- q311: calibration monotonicity audit — is conversion rate
    //      nondecreasing in spend decile? The sanity check behind any
    //      "score predicts outcome" claim (q300's AUC says HOW MUCH,
    //      this says WHERE the ordering breaks). Deciles come from
    //      one disc-percentile cut row broadcast onto the scan
    //      (q207's quintile idiom, at 10 bands); adjacent bands pair
    //      by an equi-join on band+1 over ≤10 rows; the violation
    //      test is the exact integer cross-multiplication
    //      pos_lo·n_hi > pos_hi·n_lo — no rate floats anywhere, the
    //      emitted rates are shared single divisions. ----
    QueryDef(
      "q311_calibration_monotonicity",
      (s, d) => {
        val e = t(s, d, "events").filter(col("value").isNotNull)
          .select(expr("CAST(floor(value * 100) AS BIGINT)").as("score"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("pos"))
        val cuts = e.agg(array((1 to 9).map(i =>
          expr(s"percentile_disc(0.${i}) WITHIN GROUP (ORDER BY score)")
            .cast("long")): _*).as("cuts"))
        val banded = e.crossJoin(broadcast(cuts))
          .withColumn("band",
            (size(filter(col("cuts"), c => col("score") > c)) + 1)
              .cast("long"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
        banded.select(col("band"), col("n").as("n_lo"), col("p").as("p_lo"))
          .join(banded.select((col("band") - 1).as("band"),
            col("n").as("n_hi"), col("p").as("p_hi")), Seq("band"))
          .withColumn("viol",
            when(expr("p_lo * n_hi > p_hi * n_lo"), 1L).otherwise(0L))
          .withColumn("rate_lo",
            expr("CAST(p_lo AS DOUBLE) / CAST(n_lo AS DOUBLE)"))
          .withColumn("rate_hi",
            expr("CAST(p_hi AS DOUBLE) / CAST(n_hi AS DOUBLE)"))
          .select("band", "n_lo", "p_lo", "n_hi", "p_hi", "viol",
            "rate_lo", "rate_hi")
      },
      Some("""
        WITH e AS (
          SELECT CAST(floor("value" * 100) AS BIGINT) AS score,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
          FROM events WHERE "value" IS NOT NULL),
        c AS (
          SELECT [quantile_disc(score, 0.1), quantile_disc(score, 0.2),
            quantile_disc(score, 0.3), quantile_disc(score, 0.4),
            quantile_disc(score, 0.5), quantile_disc(score, 0.6),
            quantile_disc(score, 0.7), quantile_disc(score, 0.8),
            quantile_disc(score, 0.9)] AS cuts
          FROM e),
        b AS (
          SELECT CAST(len(list_filter(cuts, x -> score > x)) + 1
              AS BIGINT) AS band,
            COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS p
          FROM e, c GROUP BY 1)
        SELECT lo.band, lo.n AS n_lo, lo.p AS p_lo,
          hi.n AS n_hi, hi.p AS p_hi,
          CAST(CASE WHEN lo.p * hi.n > hi.p * lo.n
            THEN 1 ELSE 0 END AS BIGINT) AS viol,
          CAST(lo.p AS DOUBLE) / CAST(lo.n AS DOUBLE) AS rate_lo,
          CAST(hi.p AS DOUBLE) / CAST(hi.n AS DOUBLE) AS rate_hi
        FROM b lo JOIN b hi ON hi.band = lo.band + 1""")),

    // ---- q312: Simpson's-paradox stratification audit — does the
    //      weekend-vs-weekday conversion association keep its sign
    //      inside every hour-of-day stratum? The classic aggregation
    //      trap a metrics platform must surface before anyone reads
    //      the marginal table. One scan → (stratum × exposure)
    //      integer counts; the association sign per stratum is the
    //      exact cross-multiplication sign(conv_e·n_u − conv_u·n_e);
    //      the marginal rides in as stratum = −1 via a union of the
    //      same aggregate, so the paradox is a single scan down one
    //      integer column. ----
    QueryDef(
      "q312_simpson_audit",
      (s, d) => {
        val e = t(s, d, "events")
          .select(expr("(ts div 3600000000) % 24 div 6").as("stratum"),
            expr("CAST(CASE WHEN ((ts div 86400000000) + 4) % 7 IN (0, 6)" +
              " THEN 1 ELSE 0 END AS BIGINT)").as("exposed"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("pos"))
        def cells(g: org.apache.spark.sql.DataFrame) = g
          .groupBy("stratum")
          .agg(sum(when(col("exposed") === 1, 1L).otherwise(0L)).as("n_e"),
            sum(when(col("exposed") === 1, col("pos")).otherwise(0L))
              .as("p_e"),
            sum(when(col("exposed") === 0, 1L).otherwise(0L)).as("n_u"),
            sum(when(col("exposed") === 0, col("pos")).otherwise(0L))
              .as("p_u"))
        cells(e)
          .unionByName(cells(e.withColumn("stratum", lit(-1L))))
          .withColumn("assoc_sign", expr(
            "CAST(sign(p_e * n_u - p_u * n_e) AS BIGINT)"))
      },
      Some("""
        WITH e AS (
          SELECT (epoch_us(ts) // 3600000000) % 24 // 6 AS stratum,
            CASE WHEN ((epoch_us(ts) // 86400000000) + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS exposed,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
          FROM events),
        g AS (
          SELECT stratum,
            CAST(SUM(CASE WHEN exposed = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_e,
            CAST(SUM(CASE WHEN exposed = 1 THEN pos ELSE 0 END)
              AS BIGINT) AS p_e,
            CAST(SUM(CASE WHEN exposed = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_u,
            CAST(SUM(CASE WHEN exposed = 0 THEN pos ELSE 0 END)
              AS BIGINT) AS p_u
          FROM e GROUP BY 1
          UNION ALL
          SELECT -1,
            CAST(SUM(CASE WHEN exposed = 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(SUM(CASE WHEN exposed = 1 THEN pos ELSE 0 END) AS BIGINT),
            CAST(SUM(CASE WHEN exposed = 0 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(SUM(CASE WHEN exposed = 0 THEN pos ELSE 0 END) AS BIGINT)
          FROM e)
        SELECT stratum, n_e, p_e, n_u, p_u,
          CAST(sign(p_e * n_u - p_u * n_e) AS BIGINT) AS assoc_sign
        FROM g""")),

    // ---- q313: whole-catalog datasheet — ONE query auditing every
    //      table in the lake: row count, declared-key cardinality and
    //      a uniqueness flag per table (q131 profiles one table's
    //      columns; this is the cross-table inventory a catalog UI
    //      reads). Each arm is an independent single-scan aggregate —
    //      they parallelize as separate stages and union to 10 rows;
    //      lineitem's composite key packs into one integer
    //      (linenumber < 10 in this schema). All integers. ----
    QueryDef(
      "q313_catalog_audit",
      (s, d) => {
        // conditional spread by the audited key (no-op on a parallel
        // scan): the countDistinct dedup phase ran on each table's
        // single scan task; keyed on the audit key it dedups in place
        // with no further exchange before the 1-row rollup
        def arm(tbl: String, keyExpr: String) =
          graft.operators.InputSpread.byKey(t(s, d, tbl), expr(keyExpr))
            .agg(count(lit(1)).as("n_rows"),
            countDistinct(expr(keyExpr)).as("n_keys"))
            .select(lit(tbl).as("tbl"), col("n_rows"), col("n_keys"),
              when(col("n_rows") === col("n_keys"), 1L).otherwise(0L)
                .as("key_unique"))
        Seq(
          arm("region", "r_regionkey"), arm("nation", "n_nationkey"),
          arm("customer", "c_custkey"), arm("supplier", "s_suppkey"),
          arm("part", "p_partkey"), arm("orders", "o_orderkey"),
          arm("lineitem", "l_orderkey * 10 + l_linenumber"),
          arm("events", "event_id"), arm("documents", "doc_id"),
          arm("embeddings", "vec_id")).reduce(_.unionByName(_))
      },
      Some("""
        SELECT 'region' AS tbl, COUNT(*) AS n_rows,
          CAST(COUNT(DISTINCT r_regionkey) AS BIGINT) AS n_keys,
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT r_regionkey)
            THEN 1 ELSE 0 END AS BIGINT) AS key_unique FROM region
        UNION ALL SELECT 'nation', COUNT(*),
          CAST(COUNT(DISTINCT n_nationkey) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT n_nationkey)
            THEN 1 ELSE 0 END AS BIGINT) FROM nation
        UNION ALL SELECT 'customer', COUNT(*),
          CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT c_custkey)
            THEN 1 ELSE 0 END AS BIGINT) FROM customer
        UNION ALL SELECT 'supplier', COUNT(*),
          CAST(COUNT(DISTINCT s_suppkey) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT s_suppkey)
            THEN 1 ELSE 0 END AS BIGINT) FROM supplier
        UNION ALL SELECT 'part', COUNT(*),
          CAST(COUNT(DISTINCT p_partkey) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT p_partkey)
            THEN 1 ELSE 0 END AS BIGINT) FROM part
        UNION ALL SELECT 'orders', COUNT(*),
          CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT o_orderkey)
            THEN 1 ELSE 0 END AS BIGINT) FROM orders
        UNION ALL SELECT 'lineitem', COUNT(*),
          CAST(COUNT(DISTINCT l_orderkey * 10 + l_linenumber)
            AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT
            l_orderkey * 10 + l_linenumber) THEN 1 ELSE 0 END
            AS BIGINT) FROM lineitem
        UNION ALL SELECT 'events', COUNT(*),
          CAST(COUNT(DISTINCT event_id) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT event_id)
            THEN 1 ELSE 0 END AS BIGINT) FROM events
        UNION ALL SELECT 'documents', COUNT(*),
          CAST(COUNT(DISTINCT doc_id) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT doc_id)
            THEN 1 ELSE 0 END AS BIGINT) FROM documents
        UNION ALL SELECT 'embeddings', COUNT(*),
          CAST(COUNT(DISTINCT vec_id) AS BIGINT),
          CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT vec_id)
            THEN 1 ELSE 0 END AS BIGINT) FROM embeddings""")),

    // ---- q317: stratified-matching treatment-effect table — the
    //      matching-estimator companion to q245's IPW and q312's sign
    //      audit: compare weekend (treated) vs weekday (control)
    //      spend WITHIN hour-of-day strata, so the time-of-day
    //      confounder can't leak into the contrast. Per stratum:
    //      cell sizes, cent-exact outcome sums, and the mean
    //      difference as the cross-multiplied integer pair
    //      diff_num = sum_t·n_c − sum_c·n_t over den = n_t·n_c — the
    //      per-stratum ATT is one shared division, and no
    //      order-dependent float sum exists anywhere. One scan, one
    //      grouped aggregate. ----
    QueryDef(
      "q317_stratified_matching",
      (s, d) =>
        t(s, d, "events").filter(col("value").isNotNull)
          .select(expr("(ts div 3600000000) % 24 div 6").as("stratum"),
            expr("CAST(CASE WHEN ((ts div 86400000000) + 4) % 7 IN (0, 6)" +
              " THEN 1 ELSE 0 END AS BIGINT)").as("treated"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("y"))
          .groupBy("stratum")
          .agg(
            sum(col("treated")).as("n_t"),
            sum(lit(1L) - col("treated")).as("n_c"),
            sum(when(col("treated") === 1, col("y")).otherwise(0L))
              .as("sum_t"),
            sum(when(col("treated") === 0, col("y")).otherwise(0L))
              .as("sum_c"))
          .filter(col("n_t") > 0 && col("n_c") > 0)
          .withColumn("diff_num", expr("sum_t * n_c - sum_c * n_t"))
          .withColumn("den", expr("n_t * n_c"))
          .withColumn("att_cents", expr(
            "CAST(sum_t * n_c - sum_c * n_t AS DOUBLE)" +
              " / CAST(n_t * n_c AS DOUBLE)")),
      Some("""
        WITH e AS (
          SELECT (epoch_us(ts) // 3600000000) % 24 // 6 AS stratum,
            CASE WHEN ((epoch_us(ts) // 86400000000) + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS treated,
            CAST(floor("value" * 100) AS BIGINT) AS y
          FROM events WHERE "value" IS NOT NULL),
        g AS (
          SELECT stratum,
            CAST(SUM(treated) AS BIGINT) AS n_t,
            CAST(SUM(1 - treated) AS BIGINT) AS n_c,
            CAST(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END)
              AS BIGINT) AS sum_t,
            CAST(SUM(CASE WHEN treated = 0 THEN y ELSE 0 END)
              AS BIGINT) AS sum_c
          FROM e GROUP BY 1)
        SELECT stratum, n_t, n_c, sum_t, sum_c,
          sum_t * n_c - sum_c * n_t AS diff_num,
          n_t * n_c AS den,
          CAST(sum_t * n_c - sum_c * n_t AS DOUBLE)
            / CAST(n_t * n_c AS DOUBLE) AS att_cents
        FROM g WHERE n_t > 0 AND n_c > 0""")),

    // ---- q318: temporal cold-start coverage — after a time split
    //      (train: before 2024-01-21, test: after), what fraction of
    //      the entities the test period touches were NEVER seen in
    //      training? The deployment-readiness number for any
    //      entity-keyed model (an unseen user hits the cold-start
    //      path; an unseen item gets no collaborative signal). One
    //      arm per entity axis (users, event types, spend bands),
    //      each a distinct-set anti-join — test-distinct LEFT ANTI
    //      train-distinct, ids only — unioned to 3 rows; the ppm is
    //      integer floor division. ----
    QueryDef(
      "q318_coldstart_coverage",
      (s, d) => {
        val cut = 1705795200000000L // 2024-01-21T00:00Z
        val e = t(s, d, "events").filter(col("value").isNotNull)
        def arm(name: String, keyExpr: String) = {
          val tr = e.filter(col("ts") < cut)
            .select(expr(keyExpr).as("k")).distinct()
          val te = e.filter(col("ts") >= cut)
            .select(expr(keyExpr).as("k")).distinct()
          val unseen = te.join(tr, Seq("k"), "left_anti")
            .agg(count(lit(1)).as("n_unseen"))
          te.agg(count(lit(1)).as("n_test"))
            .crossJoin(unseen)
            .select(lit(name).as("axis"), col("n_test"), col("n_unseen"),
              expr("n_unseen * 1000000 div n_test").as("unseen_ppm"))
        }
        Seq(arm("user", "user_id"),
          arm("event_type", "event_type"),
          arm("spend_band", "CAST(floor(value / 50) AS BIGINT)"))
          .reduce(_.unionByName(_))
      },
      Some("""
        WITH e AS (
          SELECT *, epoch_us(ts) AS tu FROM events
          WHERE "value" IS NOT NULL),
        arms AS (
          SELECT 'user' AS axis,
            (SELECT COUNT(DISTINCT user_id) FROM e
             WHERE tu >= 1705795200000000) AS n_test,
            (SELECT COUNT(*) FROM
              (SELECT DISTINCT user_id FROM e
               WHERE tu >= 1705795200000000) t
             WHERE t.user_id NOT IN
              (SELECT DISTINCT user_id FROM e
               WHERE tu < 1705795200000000)) AS n_unseen
          UNION ALL
          SELECT 'event_type',
            (SELECT COUNT(DISTINCT event_type) FROM e
             WHERE tu >= 1705795200000000),
            (SELECT COUNT(*) FROM
              (SELECT DISTINCT event_type FROM e
               WHERE tu >= 1705795200000000) t
             WHERE t.event_type NOT IN
              (SELECT DISTINCT event_type FROM e
               WHERE tu < 1705795200000000))
          UNION ALL
          SELECT 'spend_band',
            (SELECT COUNT(DISTINCT CAST(floor("value" / 50) AS BIGINT))
             FROM e WHERE tu >= 1705795200000000),
            (SELECT COUNT(*) FROM
              (SELECT DISTINCT CAST(floor("value" / 50) AS BIGINT) AS b
               FROM e WHERE tu >= 1705795200000000) t
             WHERE t.b NOT IN
              (SELECT DISTINCT CAST(floor("value" / 50) AS BIGINT)
               FROM e WHERE tu < 1705795200000000)))
        SELECT axis, CAST(n_test AS BIGINT) AS n_test,
          CAST(n_unseen AS BIGINT) AS n_unseen,
          CAST(n_unseen AS BIGINT) * 1000000 // CAST(n_test AS BIGINT)
            AS unseen_ppm
        FROM arms""")),

    // ---- q327: t-closeness audit (Li, Li & Venkatasubramanian,
    //      ICDE'07) — the third leg of the privacy triad: q104 gates
    //      group SIZE (k-anonymity), q295 gates distinct sensitive
    //      VALUES (l-diversity), but a diverse group whose value
    //      DISTRIBUTION skews far from the table's still leaks
    //      (skewness attack). Per QI group (q295's event_type × dow),
    //      distance = ordered-domain EMD between the group's
    //      spend-band distribution and the global one:
    //      (1/(m−1)) · Σ_j |P_g(≤b_j) − P(≤b_j)|. The cumulative-
    //      difference numerator is exact int64 after clearing
    //      denominators (|cum_g·N − cum_G·n_g| — ≤ ~1e10 at sf0.1;
    //      at ≫ sf1 pre-normalize both cumuls to ppm first), so only
    //      the final t is a mirrored IEEE division.
    //
    //      Scale shape: NO global window — the band domain is tiny
    //      (≤ ~a dozen values), so global cumulatives come from a
    //      broadcast triangle join on the band table and per-group
    //      cumulatives from a (group-equi, band ≤) join against the
    //      broadcast domain; the only corpus-sized exchange is the
    //      (group, band) count aggregate. ----
    QueryDef(
      "q327_t_closeness",
      (s, d) => {
        val cgb = t(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("((ts div 86400000000) + 4) % 7").as("dow"),
            expr("CAST(floor(value / 100) AS BIGINT)").as("band"))
          .groupBy("event_type", "dow", "band")
          .agg(count(lit(1)).as("c"))
        val groups = cgb.groupBy("event_type", "dow")
          .agg(sum(col("c")).as("n_g"))
        val bandTot = cgb.groupBy("band").agg(sum(col("c")).as("cb"))
        val tot = bandTot.agg(sum(col("cb")).as("big_n"),
          count(lit(1)).as("m"))
        val cumG = bandTot.as("x")
          .join(broadcast(bandTot.select(col("band").as("b2"),
            col("cb").as("cb2"))), col("b2") <= col("band"))
          .groupBy("band").agg(sum(col("cb2")).as("cum_g"))
        val grid = groups.crossJoin(broadcast(bandTot.select("band")))
        // band predicate lives in the LEFT JOIN condition: a grid row
        // with no group mass at-or-below its band must survive with
        // cum_c = 0, not vanish via join-then-filter
        val cgbR = cgb.select(col("event_type").as("et2"),
          col("dow").as("dow2"), col("band").as("b3"), col("c"))
        val cumC = grid
          .join(cgbR,
            col("et2") === col("event_type") &&
              col("dow2") === col("dow") && col("b3") <= col("band"),
            "left")
          .groupBy("event_type", "dow", "n_g", "band")
          .agg(sum(coalesce(col("c"), lit(0L))).as("cum_c"))
        cumC.join(broadcast(cumG), Seq("band"))
          .crossJoin(broadcast(tot))
          .select(col("event_type"), col("dow"), col("n_g"),
            col("m"), col("big_n"),
            abs(col("cum_c") * col("big_n") - col("cum_g") * col("n_g"))
              .as("seg"))
          .groupBy("event_type", "dow", "n_g", "m", "big_n")
          .agg(sum(col("seg")).as("emd_num"))
          .select(col("event_type"), col("dow"), col("n_g"), col("m"),
            col("emd_num"),
            (col("n_g") * col("big_n") * (col("m") - 1)).as("emd_den"),
            (col("emd_num").cast("double") /
              (col("n_g") * col("big_n") * (col("m") - 1)).cast("double"))
              .as("t_dist"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type,
            ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
            CAST(floor("value" / 100) AS BIGINT) AS band
          FROM events WHERE "value" IS NOT NULL),
        cgb AS (
          SELECT event_type, dow, band, COUNT(*) AS c
          FROM ev GROUP BY 1, 2, 3),
        groups AS (
          SELECT event_type, dow, CAST(SUM(c) AS BIGINT) AS n_g
          FROM cgb GROUP BY 1, 2),
        band_tot AS (
          SELECT band, CAST(SUM(c) AS BIGINT) AS cb
          FROM cgb GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(cb) AS BIGINT) AS big_n, COUNT(*) AS m
          FROM band_tot),
        cum_g AS (
          SELECT band,
            CAST(SUM(cb) OVER (ORDER BY band
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_g
          FROM band_tot),
        grid AS (
          SELECT g.event_type, g.dow, g.n_g, b.band
          FROM groups g CROSS JOIN band_tot b),
        cum_c AS (
          SELECT gr.event_type, gr.dow, gr.n_g, gr.band,
            CAST(COALESCE(SUM(c.c), 0) AS BIGINT) AS cum_c
          FROM grid gr LEFT JOIN cgb c
            ON c.event_type = gr.event_type AND c.dow = gr.dow
            AND c.band <= gr.band
          GROUP BY 1, 2, 3, 4)
        SELECT cc.event_type, cc.dow, cc.n_g, t.m,
          CAST(SUM(abs(cc.cum_c * t.big_n - cg.cum_g * cc.n_g))
            AS BIGINT) AS emd_num,
          cc.n_g * t.big_n * (t.m - 1) AS emd_den,
          CAST(SUM(abs(cc.cum_c * t.big_n - cg.cum_g * cc.n_g))
            AS DOUBLE) / CAST(cc.n_g * t.big_n * (t.m - 1) AS DOUBLE)
            AS t_dist
        FROM cum_c cc
        JOIN cum_g cg ON cc.band = cg.band
        CROSS JOIN tot t
        GROUP BY 1, 2, 3, 4, cc.n_g, t.big_n""")),

    // ---- q330: Luhn check-digit audit (ISO/IEC 7812) — checksum
    //      VALIDATION of an ID column: q74's PII scan pattern-matches
    //      card-like digit runs, but real pipelines gate on the Luhn
    //      checksum to cut the false-positive flood (a random 12-digit
    //      string passes only 10% of the time). Here every order's
    //      zero-padded key is validated: double every 2nd digit from
    //      the right, fold >9 down by 9, valid iff the sum ≡ 0 mod 10
    //      — pure integer HOF arithmetic, identical both engines.
    //
    //      Scale shape: per-row codegen'd arithmetic + one 3-key
    //      status aggregate; nothing else moves. ----
    QueryDef(
      "q330_luhn_audit",
      (s, d) => {
        val digit = (i: String) =>
          s"CAST(substring(acct, 13 - $i, 1) AS BIGINT)"
        t(s, d, "orders")
          .select(col("o_orderstatus"),
            lpad(col("o_orderkey").cast("string"), 12, "0").as("acct"))
          .withColumn("luhn_sum", expr(s"""
            aggregate(sequence(1, 12), 0L, (acc, i) -> acc +
              CASE WHEN i % 2 = 0 THEN
                CASE WHEN ${digit("i")} * 2 > 9
                  THEN ${digit("i")} * 2 - 9
                  ELSE ${digit("i")} * 2 END
              ELSE ${digit("i")} END)"""))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(when(col("luhn_sum") % 10 === 0, 1L).otherwise(0L))
              .as("n_valid"))
          .withColumn("valid_ppm", expr("n_valid * 1000000 div n"))
      },
      Some("""
        WITH a AS (
          SELECT o_orderstatus,
            lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS acct
          FROM orders),
        l AS (
          SELECT o_orderstatus,
            list_sum(list_transform(generate_series(1, 12), i ->
              CASE WHEN i % 2 = 0 THEN
                CASE WHEN CAST(substr(acct, CAST(13 - i AS INT), 1)
                    AS BIGINT) * 2 > 9
                  THEN CAST(substr(acct, CAST(13 - i AS INT), 1)
                    AS BIGINT) * 2 - 9
                  ELSE CAST(substr(acct, CAST(13 - i AS INT), 1)
                    AS BIGINT) * 2 END
              ELSE CAST(substr(acct, CAST(13 - i AS INT), 1) AS BIGINT)
              END)) AS luhn_sum
          FROM a)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_valid,
          CAST(SUM(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) * 1000000 // COUNT(*) AS valid_ppm
        FROM l GROUP BY 1""")),

    // ---- q331: sample-ratio-mismatch (SRM) audit — the first gate
    //      of every experimentation pipeline: users hash into two
    //      arms that SHOULD be 50/50; per event_type, compare the
    //      arms' distinct-user exposure with the one-degree chi-square
    //      χ² = (n_A − n_B)²/(n_A + n_B). A χ² above 3.84 (p < .05)
    //      means randomization or logging is broken and every
    //      downstream metric is suspect (Fabijan et al., KDD'19
    //      diagnosis playbook). Both the statistic's integer
    //      numerator/denominator AND the flag are exact: the
    //      3.84 threshold compares as 100·(n_A−n_B)² > 384·(n_A+n_B),
    //      so no float crosses the gate.
    //
    //      Scale shape: arm assignment is a per-row md5 (the q53
    //      deterministic-split discipline, randomization-unit = user);
    //      exposure dedupes to (event_type, user) before counting;
    //      one 5-key aggregate. ----
    QueryDef(
      "q331_srm_audit",
      (s, d) => {
        val hex = lit("0123456789abcdef")
        val armBit =
          (instr(hex, substring(md5(col("user_id").cast("string")), 1, 1))
            - 1) % 2
        t(s, d, "events")
          .select(col("event_type"), col("user_id"))
          .distinct()
          .select(col("event_type"), armBit.as("arm"))
          .groupBy("event_type")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
          .withColumn("chi2_num",
            (col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
          .withColumn("chi2",
            col("chi2_num").cast("double") /
              (col("n_a") + col("n_b")).cast("double"))
          .withColumn("srm_flag",
            when(col("chi2_num") * 100 > (col("n_a") + col("n_b")) * 384,
              1L).otherwise(0L))
      },
      Some("""
        WITH u AS (
          SELECT DISTINCT event_type, user_id FROM events),
        a AS (
          SELECT event_type,
            (strpos('0123456789abcdef',
              substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
              AS arm
          FROM u),
        c AS (
          SELECT event_type,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_a,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_b
          FROM a GROUP BY 1)
        SELECT event_type, n_a, n_b,
          (n_a - n_b) * (n_a - n_b) AS chi2_num,
          CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
            / CAST(n_a + n_b AS DOUBLE) AS chi2,
          CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 100
              > (n_a + n_b) * 384 THEN 1 ELSE 0 END AS BIGINT)
            AS srm_flag
        FROM c""")),

    // ---- q335: functional-dependency audit — data-profiling beyond
    //      q131's per-column stats: for candidate FDs X→Y, how close
    //      does the data come to satisfying them? Per FD: distinct
    //      LHS values, LHS values with >1 RHS (violators), the max
    //      RHS fan-out, and the g3-style violation row count (rows
    //      that would need deletion to make the FD hold = n_rows −
    //      Σ_x max_y |x,y|). The audit that catches denormalization
    //      drift and upstream-join fan-out bugs before they ship.
    //
    //      Scale shape: per FD one (x,y) count aggregate then an
    //      x-keyed rollup — both combinable; the three FDs union at
    //      report grain. ----
    QueryDef(
      "q335_fd_audit",
      (s, d) => {
        def fd(df: org.apache.spark.sql.DataFrame, name: String,
            x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = {
          df.select(x.as("x"), y.as("y"))
            .groupBy("x", "y").agg(count(lit(1)).as("c"))
            .groupBy("x")
            .agg(count(lit(1)).as("n_rhs"), sum(col("c")).as("n_rows"),
              max(col("c")).as("max_keep"))
            .agg(lit(name).as("fd"),
              count(lit(1)).as("n_lhs"),
              sum(when(col("n_rhs") > 1, 1L).otherwise(0L))
                .as("n_violating_lhs"),
              max(col("n_rhs")).as("max_rhs_fanout"),
              sum(col("n_rows") - col("max_keep")).as("g3_rows"))
        }
        val docs = t(s, d, "documents")
        val ev = t(s, d, "events")
        fd(docs, "source->lang", col("source"), col("lang"))
          .unionByName(fd(docs, "lang->source", col("lang"), col("source")))
          .unionByName(fd(ev, "user->event_type",
            col("user_id"), col("event_type")))
      },
      Some("""
        WITH f1 AS (
          SELECT source AS x, lang AS y, COUNT(*) AS c
          FROM documents GROUP BY 1, 2),
        g1 AS (
          SELECT x, COUNT(*) AS n_rhs, CAST(SUM(c) AS BIGINT) AS n_rows,
            MAX(c) AS max_keep
          FROM f1 GROUP BY 1),
        f2 AS (
          SELECT lang AS x, source AS y, COUNT(*) AS c
          FROM documents GROUP BY 1, 2),
        g2 AS (
          SELECT x, COUNT(*) AS n_rhs, CAST(SUM(c) AS BIGINT) AS n_rows,
            MAX(c) AS max_keep
          FROM f2 GROUP BY 1),
        f3 AS (
          SELECT user_id AS x, event_type AS y, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        g3 AS (
          SELECT x, COUNT(*) AS n_rhs, CAST(SUM(c) AS BIGINT) AS n_rows,
            MAX(c) AS max_keep
          FROM f3 GROUP BY 1)
        SELECT 'source->lang' AS fd, COUNT(*) AS n_lhs,
          CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_violating_lhs,
          MAX(n_rhs) AS max_rhs_fanout,
          CAST(SUM(n_rows - max_keep) AS BIGINT) AS g3_rows
        FROM g1
        UNION ALL
        SELECT 'lang->source', COUNT(*),
          CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
          MAX(n_rhs),
          CAST(SUM(n_rows - max_keep) AS BIGINT)
        FROM g2
        UNION ALL
        SELECT 'user->event_type', COUNT(*),
          CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
          MAX(n_rhs),
          CAST(SUM(n_rows - max_keep) AS BIGINT)
        FROM g3""")),

    // ---- q342: CUPED variance reduction (Deng et al., WSDM'13) —
    //      the standard experimentation-readout adjustment: per user,
    //      Y = post-period spend and X = pre-period spend (the q313/
    //      q318 fixed cutoff); θ = cov(X,Y)/var(X) pooled across
    //      arms, and each arm reports mean(Y) − θ·(mean(X) − mean(X))
    //      — same expectation as the raw mean, far lower variance
    //      when X predicts Y. The four moment sums (Σx, Σy, Σxx,
    //      Σxy) and counts are exact int64 (n·Σxy ≈ 2e18 at sf0.1 —
    //      inside int64 here; rebase cents→dollars beyond sf1); θ
    //      and the adjusted means are the same mirrored IEEE op
    //      chain on both engines. Arms come from the q331 md5
    //      assignment, so SRM-gate and readout share units.
    //
    //      Scale shape: one user-level aggregate (combinable), then
    //      arm-level + pooled one-row aggregates joined back by
    //      broadcast. ----
    QueryDef(
      "q342_cuped",
      (s, d) => {
        val cut = 1705795200000000L // 2024-01-21T00:00Z
        val hex = lit("0123456789abcdef")
        val armBit =
          (instr(hex, substring(md5(col("user_id").cast("string")), 1, 1))
            - 1) % 2
        val perUser = t(s, d, "events").filter(col("value").isNotNull)
          .select(col("user_id"),
            when(col("ts") < cut, round(col("value") * 100).cast("long"))
              .otherwise(0L).as("xc"),
            when(col("ts") >= cut, round(col("value") * 100).cast("long"))
              .otherwise(0L).as("yc"))
          .groupBy("user_id")
          .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
          .select(armBit.as("arm"), col("x"), col("y"))
        val pooled = perUser.agg(
          count(lit(1)).as("n_all"), sum(col("x")).as("sx_all"),
          sum(col("y")).as("sy_all"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        val theta =
          ((col("n_all") * col("sxy") - col("sx_all") * col("sy_all"))
            .cast("double")) /
            ((col("n_all") * col("sxx") - col("sx_all") * col("sx_all"))
              .cast("double"))
        perUser.groupBy("arm")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_x"),
            sum(col("y")).as("sum_y"))
          .crossJoin(broadcast(pooled))
          .select(col("arm"), col("n"), col("sum_x"), col("sum_y"),
            theta.as("theta"),
            ((col("sum_y").cast("double") / col("n").cast("double")) -
              (theta *
                ((col("sum_x").cast("double") / col("n").cast("double")) -
                  (col("sx_all").cast("double") /
                    col("n_all").cast("double")))))
              .as("adj_mean_cents"))
      },
      Some("""
        WITH per_user AS (
          SELECT user_id,
            (strpos('0123456789abcdef',
              substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
              AS arm,
            CAST(SUM(CASE WHEN epoch_us(ts) < 1705795200000000
              THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
            CAST(SUM(CASE WHEN epoch_us(ts) >= 1705795200000000
              THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
          FROM events WHERE "value" IS NOT NULL
          GROUP BY 1, 2),
        pooled AS (
          SELECT COUNT(*) AS n_all,
            CAST(SUM(x) AS BIGINT) AS sx_all,
            CAST(SUM(y) AS BIGINT) AS sy_all,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per_user),
        arms AS (
          SELECT arm, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sum_x,
            CAST(SUM(y) AS BIGINT) AS sum_y
          FROM per_user GROUP BY 1)
        SELECT arm, n, sum_x, sum_y,
          CAST(n_all * sxy - sx_all * sy_all AS DOUBLE)
            / CAST(n_all * sxx - sx_all * sx_all AS DOUBLE) AS theta,
          (CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE))
            - ((CAST(n_all * sxy - sx_all * sy_all AS DOUBLE)
                / CAST(n_all * sxx - sx_all * sx_all AS DOUBLE))
              * ((CAST(sum_x AS DOUBLE) / CAST(n AS DOUBLE))
                - (CAST(sx_all AS DOUBLE) / CAST(n_all AS DOUBLE))))
            AS adj_mean_cents
        FROM arms, pooled""")),
  )
}
