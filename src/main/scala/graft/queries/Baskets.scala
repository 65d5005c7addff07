package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.operators.DerivedTable

/** The shared market-basket pair table behind the co-purchase pack —
  * q185 pair mining and q325 k-core both need the identical
  * within-order pair aggregate `(p1 < p2, support ≥ 2)` (q185's
  * support floor and q325's edge-weight floor are the same `≥ 2`), so
  * it is materialized once per (session, dataset) via [[DerivedTable]]
  * and both consume a plain scan. The oracles still derive it from
  * scratch, so hash equality independently certifies the amortization
  * (same contract as [[SimGraph]]).
  *
  * Deliberately NOT materialized (measured, round 12, min-of-3
  * solo-cold at sf0.1): the `DISTINCT (l_orderkey, l_partkey)` base
  * itself. A base artifact left q344's family-grain re-distinct
  * exactly neutral (4.19 s → 4.20 s — the distinct SHUFFLE is the
  * cost, and the mod projection forces a second one regardless of the
  * input's physical form) while billing its corpus-sized write to the
  * first consumer. Only the pair aggregate — the expensive self-join
  * two queries repeat verbatim — pays for its materialization
  * (q325 3.55 s → 1.57 s). Pair fan-out is bounded by basket size
  * (~C(7,2) per order — never parts×parts), so the artifact is linear
  * in order count and far smaller than lineitem.
  *
  * Round12Spec asserts build-exactly-once, consumer plan shape, and
  * value-identity of the artifact against a fresh recomputation.
  */
object Baskets {

  /** Artifact identity version — bump on ANY semantic change to
    * [[buildPairSupports]] (part of the DerivedTable table-name hash
    * alongside the dataset content fingerprint). v2: the build
    * pre-partitions by l_orderkey (same values, different physical
    * row order in the artifact). */
  private val BuildVersion = 2

  /** Undirected co-purchase pair supports (p1 < p2, support ≥ 2),
    * materialized once per (session, dataset). */
  def pairSupports(s: SparkSession, d: String): DataFrame =
    DerivedTable.getOrBuild(s, "basket_pairs", d, BuildVersion)(
      buildPairSupports(s, d))

  /** The pair derivation itself — a PURE function of the dataset dir
    * (the DerivedTable contract); exposed so the integrity spec can
    * compare the artifact against a fresh from-scratch recomputation. */
  private[graft] def buildPairSupports(s: SparkSession, d: String)
      : DataFrame = {
    // conditional pre-partition by l_orderkey straight off the scan
    // (guide §2.4/§2.5): the driver tables are single-row-group parquet
    // files, so the scan is ONE task and the distinct's map-side ran
    // single-core over all of lineitem. Keying the spread on l_orderkey
    // makes the distinct (clustering on a superset), BOTH pair-join
    // legs and the join itself reuse this one exchange — same shuffle
    // count at any scale (the distinct needed an exchange anyway;
    // (orderkey, partkey) is already near-unique so map-side partial
    // aggregation saved nothing), but the map side now runs on every
    // core. On a many-file table the gate makes it a no-op, so raw
    // rows are never shuffled where the distinct's partial aggregation
    // would have shipped less.
    val op = graft.operators.InputSpread.byKey(
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")),
        col("l_orderkey"))
      .distinct()
    op.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
  }
}
