package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t

/** Serving-layer index builds as oracle-certified queries.
  *
  * q87 certifies [[graft.serving.Resolvers.ssoResolverIndex]] end to
  * end — the reference's SSO resolver build
  * (bin/ztf/archive_sso_resolver.py:78-178): a 3-way alias union (name,
  * valid number, native designation), "@k" duplicate-occurrence marking
  * per lowercased key, and decimal-aware ordering (numeric keys before
  * lexical). The input is derived deterministically from `part` by the
  * SAME expressions in both engines: every third part has no resolved
  * name (exercising the native-id fallback), every second part gets a
  * numeric designation with planted collisions (p_partkey % 500, so
  * each numeric key recurs ~4× at sf0.01 and the @k window is
  * load-bearing), and names reuse the first p_name word (heavy
  * collisions across parts).
  *
  * Scale shape: the union is three projections of one scan (no self
  * join); the occurrence marking is ONE keyed window over the
  * catalog-sized index — never lake-sized. The engine-side final
  * orderBy is the reference's presentation order; the driver compare is
  * order-insensitive.
  */
object Serving extends QueryPack {

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q87_sso_resolver_index",
      (s, d) => {
        val agg = t(s, d, "part").select(
          concat(lit("ZTF"), col("p_partkey").cast("string"))
            .as("ssnamenr"),
          when(col("p_partkey") % 3 =!= 0,
            split_part(col("p_name"), lit(" "), lit(1))).as("sso_name"),
          when(col("p_partkey") % 2 === 0,
            (col("p_partkey") % 500).cast("string")).as("sso_number"))
        graft.serving.Resolvers.ssoResolverIndex(agg)
      },
      Some("""
        WITH base AS (
          SELECT 'ZTF' || CAST(p_partkey AS VARCHAR) AS native,
            coalesce(CASE WHEN p_partkey % 3 <> 0
                     THEN split_part(p_name, ' ', 1) END,
                     'ZTF' || CAST(p_partkey AS VARCHAR)) AS name,
            CASE WHEN p_partkey % 2 = 0
                 THEN CAST(p_partkey % 500 AS VARCHAR) END AS number
          FROM part),
        u AS (
          SELECT name AS ssodnet, native AS ssnamenr, name, number, 0 AS blk
          FROM base
          UNION ALL
          SELECT number, native, name, number, 1
          FROM base WHERE number IS NOT NULL
          UNION ALL
          SELECT native, native, name, number, 2 FROM base),
        m AS (
          SELECT ssodnet, ssnamenr, name, number,
            row_number() OVER (
              PARTITION BY lower(ssodnet)
              ORDER BY blk, ssnamenr) - 1 AS occ
          FROM u)
        SELECT lower(ssodnet || '@' || CAST(occ AS VARCHAR)) AS ssodnet,
          ssnamenr, name, number
        FROM m""")),

    // q89 certifies the TNS-resolver index build (ref:
    // bin/ztf/tns_resolver.py:40-71): key component columns lowercased
    // in place (case-insensitive lookup — c_name's 'Customer#' prefix
    // makes the lowering load-bearing) plus the concatenated tns_key.
    // Pure per-row projection — zero shuffles at any catalog size.
    QueryDef(
      "q89_tns_resolver_index",
      (s, d) => {
        val cat = t(s, d, "customer").select(
          col("c_name").as("fullname"),
          col("c_custkey").cast("string").as("internal_name"),
          col("c_mktsegment").as("type"))
        graft.serving.Resolvers.tnsResolverIndex(
          cat, Seq("fullname", "internal_name"))
      },
      Some("""
        SELECT lower(c_name) AS fullname,
          lower(CAST(c_custkey AS VARCHAR)) AS internal_name,
          c_mktsegment AS type,
          lower(c_name) || '_' || lower(CAST(c_custkey AS VARCHAR))
            AS tns_key
        FROM customer""")))
}
