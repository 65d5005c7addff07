package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (AllPairs /
  * PPJoin family — Bayardo, Ma & Srikant WWW'07; Xiao et al. WWW'08).
  *
  * Finds EVERY pair of rows whose token-set Jaccard is >= p/q — no
  * blocking heuristic (cf. q22's lang blocks, which miss cross-block
  * pairs) and no probabilistic recall (cf. q21's LSH bands).
  *
  * COMPLETENESS. Order all tokens by one global total order; if
  * J(x,y) >= t then |x∩y| >= t·|x∪y| >= t·max(|x|,|y|), so x and y
  * share at least α_x = ceil(t·|x|) tokens. Were every common token
  * outside x's first |x| − α_x + 1 positions, the remaining α_x − 1
  * slots could not hold α_x common tokens — so each side's PREFIX
  * contains a common token, and (taking the order-minimal common
  * token) the SAME one. A plain equi-join on prefix tokens therefore
  * generates every qualifying pair.
  *
  * The candidate stage runs in the 64-bit HASH domain: tokens are
  * classed by xxhash64 and ordered by (class df, class hash) — a
  * total order on classes. The lemma survives classing: take the
  * common token c whose class is order-minimal; if no row of c's
  * class sat inside x's prefix, all >= α_x common tokens would have
  * to fit in the trailing α_x − 1 rows — contradiction — and
  * whichever same-class row IS inside contributes the identical join
  * key. Hash collisions can only MERGE classes, i.e. ADD candidates,
  * never drop them; the verify stage re-attaches the true string
  * arrays and applies the integer-exact test (J >= p/q ⟺
  * q·inter >= p·union), so the final result is exact.
  *
  * SCALE CONTRACT: shuffle volume for candidates is one 8-byte-keyed
  * (class, id, size) row per PREFIX token — about (1−t)·Σ|x| rows,
  * never |D|². Rarest-class-first ordering makes prefix tokens the
  * most selective keys in the corpus, df = 1 prefix classes are
  * dropped outright (a single-document key cannot form a pair), the
  * length filter t·|y| <= |x| <= |y|/t prunes before the pair dedup,
  * and only surviving id pairs re-attach token arrays. All threshold
  * math is integer (ceil(t·s) = (s·p + q − 1) div q), so no float
  * rounding can drop a boundary pair.
  *
  * Cf. the reference's crossmatch candidate generation
  * (fink_broker: cone-search via pixelized equi-keys then exact
  * verify) — same discretize-then-verify shape, applied to sets.
  */
object PrefixFilterJoin {

  /** `docs`: (id LONG, toks ARRAY<STRING> — DISTINCT tokens, nonempty).
    * Returns (id_a, id_b, inter, size_a, size_b, jaccard) for every
    * pair with id_a < id_b and Jaccard(toks_a, toks_b) >= p/q.
    * `jaccard` is the single-division double inter/union. */
  def selfJoin(docs: DataFrame, p: Int, q: Int): DataFrame = {
    require(p > 0 && q > 0 && p <= q, s"threshold p/q must be in (0,1]: $p/$q")
    val ids = docs.select(col("id"), col("toks"))
      .filter(size(col("toks")) > 0)
    // hash-domain token instances: (id, set size, token class)
    val tok = ids.select(col("id"), size(col("toks")).as("sz"),
      explode(col("toks")).as("tok"))
      .select(col("id"), col("sz"), xxhash64(col("tok")).as("th"))
    // class document frequency — the global-order key (rarest first).
    // Computed as a count over a th-partitioned window, NOT a
    // groupBy(th) + join back (the r14 change): the join form ran the
    // token-explode kernel TWICE (once per join side — the partial
    // aggregate and the raw side canonicalize differently, so
    // ReusedExchange cannot dedupe them) and paid a second th
    // exchange; the window ships every token row through ONE th
    // exchange and reads df in place. Same value: tok holds one row
    // per (id, class instance) with per-doc-distinct tokens, so the
    // partition row count IS the class df.
    val wdf = Window.partitionBy("th")
    // per-doc prefix: first sz − ceil(t·sz) + 1 rows under the
    // (df, th) class order; ties inside one class are interchangeable
    // because only `th` survives to the join. df = 1 classes cannot
    // form a pair — drop them before the candidate shuffle.
    val w = Window.partitionBy("id").orderBy(col("df"), col("th"))
    val prefixes = tok.withColumn("df", count(lit(1)).over(wdf))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <=
        col("sz") - expr(s"(sz * $p + ${q - 1}) div $q") + 1)
      .filter(col("df") > 1)
      .select("th", "id", "sz")
    // candidates: prefix-class equi-join; the length filter
    // t·|y| <= |x| <= |y|/t runs BEFORE the pair-dedup shuffle
    val cand = prefixes
      .select(col("th"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(prefixes
        .select(col("th"), col("id").as("id_b"), col("sz").as("sz_b")),
        Seq("th"))
      .filter(col("id_a") < col("id_b") &&
        col("sz_a") * q >= col("sz_b") * p &&
        col("sz_b") * q >= col("sz_a") * p)
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    // exact verify: re-attach the true string arrays by id, integer
    // threshold — any hash-collision candidate dies here
    cand
      .join(ids.select(col("id").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
      .join(ids.select(col("id").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("size_a", size(col("toks_a")))
      .withColumn("size_b", size(col("toks_b")))
      .withColumn("uni", col("size_a") + col("size_b") - col("inter"))
      .filter(col("inter") * q >= col("uni") * p)
      .select(col("id_a"), col("id_b"), col("inter"),
        col("size_a"), col("size_b"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }
}
