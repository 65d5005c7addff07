package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.{sumDec, t}
import graft.operators.Bucketing

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
  )
}
