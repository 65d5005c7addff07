package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.{sumDec, t}
import graft.operators.{Bucketing, Upsert}

/** Physical-layout operators (SURVEY §2 Y-rows): bucketed table layout
  * and the shuffle-free co-located join it buys.
  *
  * Bucketing is pure physical layout — the RESULT is the plain
  * equi-join+aggregate, which is what the DuckDB oracle checks; the
  * VALUE of the operator is the plan shape (zero exchanges on either
  * join side and none before the per-key aggregate), which
  * BucketingSpec asserts. At 100 TB this is the difference between
  * paying the fact-fact shuffle once at write time vs on every query.
  */
object Layout extends QueryPack {

  def defs: Seq[QueryDef] = Seq(
    // ---- bucketed co-located join + colocation-preserving aggregate ----
    QueryDef(
      "q51_bucketed_join",
      (s, d) => {
        val buckets = 8
        val orders = t(s, d, "orders")
          .select(col("o_orderkey").as("key"), col("o_totalprice"))
        val items = t(s, d, "lineitem")
          .select(col("l_orderkey").as("key"), col("l_quantity"))
        Bucketing.writeBucketed(orders, "g_orders_bkt", "key", buckets)
        Bucketing.writeBucketed(items, "g_lineitem_bkt", "key", buckets)
        Bucketing
          .colocatedJoin(s, "g_orders_bkt", "g_lineitem_bkt", "key")
          .groupBy("key")
          .agg(
            count(lit(1)).as("n_items"),
            sumDec(col("l_quantity")).as("sum_qty"),
            first(col("o_totalprice")).as("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey AS key,
          COUNT(*) AS n_items,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          o_totalprice
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_totalprice""")),

    // ---- keyed upsert (MERGE INTO): updated keys replace, new keys
    //      insert, the rest pass through. The update batch derives
    //      deterministically from the base so both engines merge the
    //      identical delta; ×2 on a double is exact (power of two). ----
    QueryDef(
      "q59_upsert",
      (s, d) => {
        val base = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))
        val mods = base.filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            lit("U").as("o_orderstatus"))
        // the insert-key offset sits far above any realistic orderkey
        // domain (TPC-H SF 100k ≈ 1.5e11 keys) so synthetic inserts can
        // never collide with real keys and hand Upsert a duplicate-keyed
        // batch at large SF
        val inserts = base.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 1000000000000L).as("o_orderkey"),
            col("o_totalprice"), lit("N").as("o_orderstatus"))
        Upsert.upsert(base, mods.unionByName(inserts), Seq("o_orderkey"))
      },
      Some("""
        WITH updates AS (
          SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
            'U' AS o_orderstatus
          FROM orders WHERE o_orderkey % 100 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000000, o_totalprice, 'N'
          FROM orders WHERE o_orderkey % 1000 = 0)
        SELECT * FROM updates
        UNION ALL
        SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus
        FROM orders o
        WHERE NOT EXISTS (
          SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)""")),
  )
}
