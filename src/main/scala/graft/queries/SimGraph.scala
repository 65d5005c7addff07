package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.TextFunctions.tokens
import graft.operators.DerivedTable

/** The shared document-similarity pair table — the ONE full-corpus
  * gram pass behind the whole graph-analytics pack (q157 sparse top-k,
  * q162 triangles, q186 walk centrality, q187 mutual-NN, q214
  * assortativity).
  *
  * Feature space: 3-gram shingles with multiplicity (consecutive
  * lowercased tokens joined by ' '), df-capped to [2, 50] so candidate
  * generation is an equi-join on the shingle with per-term fan-out
  * ≤ C(50,2) — never all-pairs. The artifact is the UNDIRECTED,
  * UNFILTERED pair aggregate `(u < v, dot, ns)`: every consumer's view
  * is a projection of it (dot and shared-gram count are symmetric), so
  * one materialization serves directed top-k rankings and thresholded
  * edge lists alike.
  *
  * Materialized once per (session, dataset) via [[DerivedTable]]: the
  * gram pass + posting self-join is each graph query's dominant cost,
  * and six suite queries re-paying it is exactly the redundancy the
  * reference's archive-index philosophy exists to remove
  * (`bin/ztf/archive_index.py:47-300` — derive once, serve many). At
  * 100 TB the pair table is skinny int64s bounded by the df cap while
  * the corpus is the 100 TB — the cheapest possible thing to persist.
  */
object SimGraph {

  /** Artifact identity version — bump on ANY semantic change to
    * [[buildPairs]] so a committed on-disk artifact from older code is
    * never served to new code (part of the DerivedTable table-name
    * hash alongside the dataset content fingerprint). v2: the build
    * pre-partitions the corpus by doc_id (same values, different
    * physical row order in the artifact). */
  private val BuildVersion = 2

  /** Undirected pair aggregate: (u, v, dot, ns) with u < v, dot =
    * Σ tf_u·tf_v over shared rare grams, ns = #shared rare grams.
    * First call per (session, dataset) pays the corpus pass;
    * subsequent calls scan the materialized table. */
  def pairs(s: SparkSession, d: String): DataFrame = {
    // the build persists a corpus-sized (doc_id, gram, tf) frame; once
    // getOrBuild has materialized the artifact that cache serves
    // nothing and would otherwise stay pinned until the embedder's
    // clearCache — release it HERE, but only when this call actually
    // performed the build (the handle is only set on a cache miss)
    var tfToRelease: Option[DataFrame] = None
    val out = DerivedTable.getOrBuild(s, "sim_pairs", d, BuildVersion) {
      val (p, tf) = buildPairsImpl(s, d)
      tfToRelease = Some(tf)
      p
    }
    tfToRelease.foreach(_.unpersist(blocking = false))
    out
  }

  /** The one-corpus-pass pair derivation itself — a PURE function of
    * the dataset dir (the DerivedTable contract); exposed so the
    * integrity spec can compare the materialized artifact against a
    * fresh recomputation value-for-value. */
  private[graft] def buildPairs(s: SparkSession, d: String): DataFrame =
    buildPairsImpl(s, d)._1

  /** Returns (pairs, tf-handle): the second element is the persisted
    * intermediate [[pairs]] unpersists after materialization. */
  private def buildPairsImpl(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    // compiled one-pass POSITIONAL shingle kernel (string-identical
    // to the HOF form; duplicates kept — tf needs them)
    val grams = graft.functions.HashFunctions
      .ngramJoin(tokens(lower(col("text"))), 3)
    // conditional pre-partition of the corpus by doc_id before the
    // gram kernel (guide §2.4/§2.5): the single-row-group driver file
    // scans as ONE task, so tokenize+shingle+explode and the tf
    // partial aggregate all ran on one core; the gate makes it a no-op
    // on a many-file table. Partitioning on doc_id satisfies the
    // (doc_id, g) grouping's clustering requirement, so the tf
    // aggregate's own exchange disappears — but that exchange was also
    // the ReusedExchange sharing point between tf's THREE consumers
    // (rare + both posting sides), so tf is persisted to keep the gram
    // pass build-once (same-window suite A/B caught the kernel running
    // twice without it). The build runs once per (session, dataset);
    // [[pairs]] unpersists tf as soon as the artifact is materialized.
    val tf = graft.operators.InputSpread.byKey(
        t(s, d, "documents").select(col("doc_id"), col("text")),
        col("doc_id"))
      .select(col("doc_id"), explode(grams).as("g"))
      .groupBy("doc_id", "g")
      .agg(count(lit(1)).as("tf"))
      .persist()
    val rare = tf.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 50)
    val posting = tf.join(broadcast(rare.select("g")), Seq("g"))
    val out = posting
      .select(col("g"), col("doc_id").as("u"), col("tf").as("tf_u"))
      .join(posting.select(col("g"), col("doc_id").as("v"),
        col("tf").as("tf_v")), Seq("g"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(sum(col("tf_u") * col("tf_v")).as("dot"),
        count(lit(1)).as("ns"))
    (out, tf)
  }

  /** Directed view: both orientations of [[pairs]] — what per-doc
    * top-k rankings (q157/q187) consume. Columns (da, db, dot, ns). */
  def directedPairs(s: SparkSession, d: String): DataFrame = {
    val p = pairs(s, d)
    p.select(col("u").as("da"), col("v").as("db"), col("dot"), col("ns"))
      .unionByName(p.select(col("v").as("da"), col("u").as("db"),
        col("dot"), col("ns")))
  }

  /** Thresholded undirected edge list (u < v): docs sharing ≥ 2 rare
    * shingles with tf-dot ≥ 4 — sparse but non-trivial at every SF
    * (36 edges at sf0.01, ~1.2k at sf0.1). What the graph-structure
    * queries (q162/q186/q214) consume. */
  def edges(s: SparkSession, d: String): DataFrame =
    pairs(s, d)
      .filter(col("dot") >= 4 && col("ns") >= 2)
      .select("u", "v")
}
