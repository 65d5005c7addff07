package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t
import graft.functions.VectorFunctions._

/** Similarity search over `embeddings` (SURVEY §7.5): exact top-k cosine
  * as the correctness baseline, random-hyperplane LSH as the scale path,
  * and LSH-bucketed embedding near-dup pairs.
  *
  * Scale design:
  *  - q24 (brute force) streams the corpus ONCE against a small broadcast
  *    probe set — linear in corpus size, the legitimate exact baseline;
  *    it is never a corpus×corpus product.
  *  - q25/q26 bucket by hyperplane-sign keys (Charikar 2002 SimHash-for-
  *    cosine): candidates come from equi-joins on bucket keys, so the
  *    plan has no CartesianProduct over the corpus (asserted by
  *    SimilaritySpec, with recall measured against the exact baseline).
  */
object Similarity extends QueryPack {

  val Dim = 64
  val TopK = 10
  val NumProbes = 10

  // LSH geometry: 8 tables × 8 bits. For θ ≈ 60° (cos ≈ 0.5) collision
  // p = 1 - θ/π ≈ 0.67 per bit → p^8 ≈ 0.04 per table → ~28% per vector
  // pair across 8 tables; candidates per probe stay O(corpus/256 × 8).
  val Tables = 8
  val BitsPerTable = 8

  // q26 near-dup geometry: the planted twins sit at cos>=0.92, so 16-bit
  // keys keep the background candidate rate ~0.2% while Hamming<=1
  // multiprobe on both sides preserves recall (see the q26 scaladoc).
  val NeardupTables = 8
  val NeardupBits = 16
  val NeardupPlanted = 50
  val TwinIdOffset = 1000000L
  val NeardupThreshold = 0.8

  private def emb(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")

  /** q233's factored power steps over quantized vectors `(… , q:
    * array<long>)` — shared with the Round11Spec parity test so the
    * proven-equivalent math and production can never drift apart.
    * Returns (x2, x3): x2 = (i, x2, x2s) and x3 = (i, x3), where
    * x2(i) = Σ_v q_vi·rs_v (rs_v = Σ_j q_vj), x2s = x2 div 1024, and
    * x3(i) = Σ_v q_vi·⟨q_v, x2s⟩ — the Gram matrix S is NEVER
    * materialized ((Σqqᵀ)·x = Σ q·⟨q,x⟩, exact under integer
    * arithmetic). x2s ships as a literal d-array (collect bounded by
    * the embedding dim — the centroids-≤K discipline); no join, no
    * d²×N shuffle, anywhere. */
  private[graft] def powerSteps(quantized: DataFrame)
      : (DataFrame, DataFrame) = {
    val qv = quantized
      .withColumn("rs",
        aggregate(col("q"), lit(0L), (acc, v) => acc + v))
      .persist() // both power steps read it
    // ragged/null guard UP FRONT: mixed lengths corrupt BOTH outputs
    // (x2 silently drops a short vector from its missing high
    // indices; x3's zip_with null-pads and nulls out s2), and a NULL
    // vector or null ELEMENT silently vanishes from every sum
    // (posexplode of null emits nothing; null products null out).
    // One cheap aggregate over the just-persisted input makes all of
    // it loud before either result exists: rs is null iff q is null
    // or contains a null element, so count(rs) < count(*) is the
    // null witness. Empty input stays legal (both outputs empty).
    val dims = qv.agg(min(size(col("q"))).as("lo"),
      max(size(col("q"))).as("hi"),
      count(lit(1)).as("n"), count(col("rs")).as("nr")).head()
    def fail(msg: String): Nothing = {
      qv.unpersist() // don't leak the cache on the failure path
      throw new IllegalArgumentException(s"powerSteps: $msg")
    }
    if (dims.getLong(2) != dims.getLong(3))
      fail(s"${dims.getLong(2) - dims.getLong(3)} of ${dims.getLong(2)} " +
        "vectors are NULL or contain null elements")
    if (!dims.isNullAt(0) && dims.getInt(0) != dims.getInt(1))
      fail(s"ragged embedding dimensions " +
        s"[${dims.getInt(0)}, ${dims.getInt(1)}] — every vector " +
        "must have the same length")
    val x2 = qv
      .select(col("rs"), posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy("i").agg(sum(col("qi") * col("rs")).as("x2"))
      .withColumn("x2s", expr("x2 div 1024"))
      .persist()
    val x2sArr = typedLit(
      x2.select(col("i"), col("x2s")).collect()
        .sortBy(_.getInt(0)).map(_.getLong(1)).toSeq)
    // uniform dims are guaranteed by the up-front guard above, so the
    // zip_with here can never null-pad
    val x3 = qv
      .withColumn("s2",
        aggregate(zip_with(col("q"), x2sArr, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v))
      .select(col("s2"), posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy("i").agg(sum(col("qi") * col("s2")).as("x3"))
    (x2, x3)
  }

  /** Exact cosine top-k of `probes` against `corpus` (both carrying
    * vec_id + embedding). Corpus is scanned once; probes broadcast.
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = probes.select(
      col("vec_id").as("probe_id"),
      col("embedding").as("pv"))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"))
    val w = Window
      .partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id")
  }

  /** LSH-bucketed ANN top-k: candidates from bucket-key equi-join, exact
    * cosine re-rank of candidates only. The probe side multiprobes
    * (exact bucket + 1-bit neighbors); the corpus index is untouched.
    */
  def annTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Candidate generation ships ONLY (bucket, id) pairs — 16 bytes/row —
    // through the 8-way bucket explode and the shuffle join, never the
    // 64-float payload (the ids-only discipline of the MinHash pipeline,
    // queries/Dedup.scala). Embeddings are re-attached to the surviving
    // candidate pairs by id equi-joins: the corpus payload crosses the
    // wire at most once, for candidates only, instead of 8x for every row.
    val pB = probes.select(
      col("vec_id").as("probe_id"),
      explode(lshProbeBuckets(col("embedding"), Dim, Tables, BitsPerTable))
        .as("bucket"))
    val cB = corpus.select(
      col("vec_id").as("neighbor_id"),
      explode(lshBuckets(col("embedding"), Dim, Tables, BitsPerTable))
        .as("bucket"))
    val cand = pB.join(cB, Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "neighbor_id")
      .dropDuplicates("probe_id", "neighbor_id")
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window
      .partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand
      .join(broadcast(p), Seq("probe_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cos")
  }

  // IVF geometry: K coarse cells, probes visit the nprobe nearest.
  val IvfCells = 16
  val IvfNProbe = 4

  /** IVF (inverted-file) coarse quantizer: deterministic centroids drawn
    * from the corpus itself (the K vectors with the smallest
    * xxhash64(vec_id) — a seeded sample without an RNG), materialized on
    * the driver as literal arrays. Corpus rows are assigned to their
    * single nearest centroid; probes fan out to the `nprobe` nearest
    * cells. Scan fraction ≈ nprobe/K of the corpus per probe.
    *
    * The centroid collect is an index-BUILD step (K rows, driver-side by
    * design, exactly like training a FAISS coarse quantizer); the search
    * path stays fully distributed.
    */
  def ivfCentroids(corpus: DataFrame, k: Int): Array[Array[Float]] =
    corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)

  private def centroidScores(v: Column, cents: Array[Array[Float]]): Column =
    graft.functions.VectorExpressions.cosineTo(v, cents)

  /** Cell id of the nearest centroid (1-based from array_position). */
  def ivfCell(v: Column, cents: Array[Array[Float]]): Column = {
    val scores = centroidScores(v, cents)
    array_position(scores, array_max(scores)).cast("int")
  }

  /** The `nprobe` nearest cell ids for a probe vector. */
  def ivfProbeCells(v: Column, cents: Array[Array[Float]], nprobe: Int): Column = {
    val scores = centroidScores(v, cents)
    // zip (score, cell), sort ascending by score, take the tail
    val zipped = arrays_zip(
      scores.as("s"),
      transform(sequence(lit(1), lit(cents.length)), i => i.cast("int")).as("c"))
    transform(
      slice(reverse(array_sort(zipped)), 1, nprobe),
      x => x.getField("c"))
  }

  /** IVF ANN top-k: equi-join probes' nprobe cells against the corpus
    * cell assignment, exact cosine re-rank inside the visited cells.
    */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = IvfCells, nprobe: Int = IvfNProbe): DataFrame = {
    val cents = ivfCentroids(corpus, cells)
    val c = corpus.select(
      col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"),
      ivfCell(col("embedding"), cents).as("cell"))
    val p = probes.select(
      col("vec_id").as("probe_id"),
      col("embedding").as("pv"),
      explode(ivfProbeCells(col("embedding"), cents, nprobe)).as("cell"))
    val w = Window
      .partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    p.join(c, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cos")
  }

  // ---- planted top-k geometry for the oracle-checkable ANN queries.
  // Probe i (vec_id < NumProbes) gets TopK twins; twin j = the probe
  // vector with coordinate j zeroed, so cos(probe, twin_j) =
  // sqrt(1 - v_j^2/||v||^2) ≈ 0.99 — far above the isotropic
  // background (<= ~0.61) and pairwise-distinct a.s. The true top-k of
  // every probe is therefore EXACTLY its own twin set, with a
  // deterministic order, and the ANN candidate stage recovers it with
  // near-certain probability (theta ≈ 8deg -> per-bit collision ~0.96,
  // per-table with Hamming<=1 multiprobe ~0.95, miss ~ 4e-11 over 8
  // tables; IVF: a 0.99-cosine twin lands in the probe's top-nprobe
  // cells by an overwhelming margin). That turns the approximate
  // queries into DuckDB-oracle-checkable ones END TO END — same trick
  // as q26's planted bimodal structure — while the pipeline itself
  // stays the honest bucketed ANN (no-cartesian plan asserts hold;
  // recall on UNplanted clustered/isotropic corpora is measured in
  // SimilaritySpec).
  val AnnTwinOffset = 2000000L

  /** q26/q78's planted near-dup corpus: each vec_id < NeardupPlanted
    * gets a twin with coordinates 0 and 32 zeroed (cos(v, twin) =
    * ||twin||/||v|| >= 0.92 on this data vs a <= 0.61 isotropic
    * background) — built by the SAME expression in the DuckDB oracles.
    */
  def plantedNeardupCorpus(e: DataFrame): DataFrame = {
    val base = e.select(col("vec_id"), col("embedding"))
    val twins = base.filter(col("vec_id") < NeardupPlanted).select(
      (col("vec_id") + TwinIdOffset).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i % 32 === 0, lit(0.0f)).otherwise(x))
        .as("embedding"))
    // NOT spread: unlike plantedAnnCorpus below, a vec_id repartition
    // here was A/B-measured neutral-to-slower in the same-window
    // suite (q26 ~1.0×, q78 0.54 → 0.66 s) — the 16-bit hash kernels
    // its consumers run are too cheap to amortize the exchange.
    // Reverted r13.
    base.unionByName(twins)
  }

  /** Base corpus + TopK planted twins per probe, built identically in
    * Spark and the DuckDB oracle (exact float zeroing, no arithmetic).
    */
  def plantedAnnCorpus(e: DataFrame): DataFrame = {
    val twins = e.filter(col("vec_id") < NumProbes)
      .select(
        col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(TopK - 1))).as("j"))
      .select(
        (col("vec_id") * 100 + col("j") + AnnTwinOffset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === col("j"), lit(0.0f)).otherwise(x))
          .as("embedding"))
    // conditional spread by vec_id (no-op on a parallel scan) — the
    // consumers' distance folds otherwise run on the single scan task
    graft.operators.InputSpread.byKey(
      e.select(col("vec_id"), col("embedding")).unionByName(twins),
      col("vec_id"))
  }

  /** The shared oracle prelude: the planted corpus in DuckDB SQL. */
  private val plantedOracleCte = s"""
        twins AS (
          SELECT e.vec_id * 100 + j.j + $AnnTwinOffset AS vec_id,
            list_transform(range(1, 1 + len(e.embedding)),
              i -> CASE WHEN i - 1 = j.j THEN 0.0::FLOAT ELSE e.embedding[i] END)
              AS embedding
          FROM embeddings e, range(0, $TopK) j(j)
          WHERE e.vec_id < $NumProbes),
        corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT * FROM twins),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus),
        scored AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
            list_dot_product(p.v, c.v)
              / (sqrt(list_dot_product(p.v, p.v))
                 * sqrt(list_dot_product(c.v, c.v))) AS cos
          FROM e p JOIN e c ON p.vec_id != c.vec_id
          WHERE p.vec_id < $NumProbes)"""

  private val plantedOracleSelect = s"""
        SELECT probe_id,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY cos DESC, neighbor_id ASC) AS rank,
          neighbor_id
        FROM scored
        QUALIFY rank <= $TopK"""

  // SemDeDup (Abbas et al. 2023) geometry: cluster the corpus into K
  // cells, then near-dedup WITHIN cells only — the clustering bounds
  // the pairing cost (cell_size² per cell instead of corpus²; at real
  // scale K grows with the corpus so cells stay bounded).
  val SemCells = 16
  val SemThreshold = 0.8

  /** Deterministic "k-means" substitute for the semantic-dedup coarse
    * clustering: the K corpus vectors with the smallest
    * (md5(vec_id), vec_id) — a seeded sample exactly expressible in
    * BOTH engines (unlike xxhash64, which DuckDB lacks), so the cell
    * assignment itself is oracle-checkable. Driver-side by design: a
    * K-row index-build step, like training a coarse quantizer.
    */
  def semCentroids(corpus: DataFrame, k: Int): Array[Array[Float]] =
    corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** Semantic dedup: assign every vector to its nearest centroid (a
    * per-row expression against the broadcast centroid matrix — zero
    * shuffles), generate candidate pairs by a cell equi-join carrying
    * ONLY (cell, id), re-attach embeddings to candidates, verify at
    * the cosine threshold, and drop every doc with a smaller-id
    * near-dup in its cell. Returns (dropped_id, cell).
    */
  def semDedupDropped(corpus: DataFrame, cells: Int = SemCells,
      threshold: Double = SemThreshold): DataFrame = {
    val cents = semCentroids(corpus, cells)
    val assigned = corpus.select(
      col("vec_id"),
      ivfCell(col("embedding"), cents).cast("long").as("cell"))
    val cand = assigned.select(col("cell"), col("vec_id").as("id_a"))
      .join(assigned.select(col("cell"), col("vec_id").as("id_b")),
        Seq("cell"))
      .filter(col("id_a") < col("id_b"))
    cand
      .join(corpus.select(col("vec_id").as("id_a"),
        col("embedding").as("v_a")), Seq("id_a"))
      .join(corpus.select(col("vec_id").as("id_b"),
        col("embedding").as("v_b")), Seq("id_b"))
      .filter(cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("dropped_id"), col("cell"))
      .distinct()
  }

  def defs: Seq[QueryDef] = Seq(
    // ---- Exact top-k baseline, DuckDB-oracle-checked. Output is
    //      (probe, rank, neighbor) — rank ties broken by id; cosine is
    //      computed identically (double fold over float elements) in
    //      both engines. ----
    QueryDef(
      "q24_knn_brute",
      (s, d) => {
        // conditional spread of the corpus side by vec_id (guide §2.5):
        // the probes broadcast, so the 200k-pair cosine fold otherwise
        // runs on the scan's single task; no-op on a many-file table.
        val e = emb(s, d)
        bruteForceTopK(e.filter(col("vec_id") < NumProbes),
          graft.operators.InputSpread.byKey(e, col("vec_id")), TopK)
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
            list_dot_product(p.v, c.v)
              / (sqrt(list_dot_product(p.v, p.v))
                 * sqrt(list_dot_product(c.v, c.v))) AS cos
          FROM e p JOIN e c ON p.vec_id != c.vec_id
          WHERE p.vec_id < $NumProbes)
        SELECT probe_id,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY cos DESC, neighbor_id ASC) AS rank,
          neighbor_id
        FROM scored
        QUALIFY rank <= $TopK""")),

    // ---- LSH ANN over the planted corpus: oracle-exact end to end
    //      (see plantedAnnCorpus — the true top-k is the twin set and
    //      the bucketed candidate stage recovers it); honest-ANN recall
    //      on unplanted corpora measured in SimilaritySpec ----
    QueryDef(
      "q25_ann_lsh",
      (s, d) => {
        val corpus = plantedAnnCorpus(emb(s, d)).persist()
        annTopK(corpus.filter(col("vec_id") < NumProbes), corpus, TopK)
          .select("probe_id", "rank", "neighbor_id")
      },
      Some(s"WITH $plantedOracleCte\n$plantedOracleSelect")),

    // ---- IVF ANN top-k over the same planted corpus: oracle-exact
    //      (the 0.99-cosine twins land inside the probe's nprobe cells) ----
    QueryDef(
      "q31_ann_ivf",
      (s, d) => {
        val corpus = plantedAnnCorpus(emb(s, d)).persist()
        ivfTopK(corpus.filter(col("vec_id") < NumProbes), corpus, TopK)
          .select("probe_id", "rank", "neighbor_id")
      },
      Some(s"WITH $plantedOracleCte\n$plantedOracleSelect")),

    // ---- Embedding-cosine near-dup pairs via LSH buckets, DuckDB-oracle-
    //      exact against the brute-force pair join.
    //
    //      The raw synthetic corpus is isotropic noise (max pairwise cos
    //      ~0.5-0.6) — a regime where hyperplane LSH provably cannot have
    //      recall (p-per-bit ~0.65; measured 2/14 in round 2). Real
    //      near-dup corpora are bimodal: near-identical pairs (cos>0.9)
    //      against a near-orthogonal background. The query therefore
    //      plants that structure IN-QUERY, deterministically and
    //      identically in both engines: each vec_id<50 gets a twin with
    //      coordinates 0 and 32 zeroed (cos(v, twin) = ||twin||/||v||,
    //      >=0.92 on this data vs a <=0.61 background). The full LSH
    //      pipeline then runs oracle-checkably end to end: 8 tables x 16
    //      bits, Hamming<=1 multiprobe on BOTH self-join sides (union
    //      covers Hamming<=2 per table -> per-pair miss ~1e-4 at the
    //      weakest planted pair, background candidate rate ~0.2% of all
    //      pairs), ids-only bucket shuffle, embeddings re-attached to
    //      candidates by id equi-joins, exact-cosine verify at 0.8. ----
    QueryDef(
      "q26_embedding_neardup",
      (s, d) => {
        // persist both: the corpus feeds the bucket build plus two
        // re-attach joins (3 derivations of the twin transform without
        // it), and the bucket table feeds BOTH self-join sides
        // (computing the 8x17-key multiprobe expansion once, q21's
        // discipline)
        val corpus = plantedNeardupCorpus(emb(s, d)).persist()
        val buckets = corpus.select(
          col("vec_id"),
          explode(lshProbeBuckets(
            col("embedding"), Dim, NeardupTables, NeardupBits)).as("bucket"))
          .persist()
        val cand = buckets.select(col("bucket"), col("vec_id").as("id_a"))
          .join(buckets.select(col("bucket"), col("vec_id").as("id_b")),
            Seq("bucket"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
          .dropDuplicates("id_a", "id_b")
        // re-attach embeddings to surviving candidates only (AQE picks
        // broadcast here at small SF from runtime sizes; at 100 TB these
        // are the two keyed shuffles the design budgets for)
        cand
          .join(corpus.select(col("vec_id").as("id_a"),
            col("embedding").as("v_a")), Seq("id_a"))
          .join(corpus.select(col("vec_id").as("id_b"),
            col("embedding").as("v_b")), Seq("id_b"))
          .filter(cosine(col("v_a"), col("v_b")) >= NeardupThreshold)
          .select("id_a", "id_b")
      },
      Some(s"""
        WITH twins AS (
          SELECT vec_id + $TwinIdOffset AS vec_id,
            list_transform(range(1, 1 + len(embedding)),
              i -> CASE WHEN (i-1) % 32 = 0 THEN 0.0::FLOAT ELSE embedding[i] END)
              AS embedding
          FROM embeddings WHERE vec_id < $NeardupPlanted),
        corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT * FROM twins),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= $NeardupThreshold""")),

    // ---- Semantic dedup (SemDeDup): deterministic coarse clustering +
    //      within-cell near-dedup, oracle-exact END TO END — the oracle
    //      replicates the exact centroid choice and argmax assignment
    //      (cosines are identical double folds in both engines, so the
    //      argmax and every verified pair agree bit-for-bit). Runs over
    //      the same planted near-dup corpus as q26 so dropped rows are
    //      guaranteed to exist. ----
    QueryDef(
      "q78_semdedup",
      (s, d) => {
        val corpus = plantedNeardupCorpus(emb(s, d)).persist()
        semDedupDropped(corpus)
      },
      Some(s"""
        WITH twins AS (
          SELECT vec_id + $TwinIdOffset AS vec_id,
            list_transform(range(1, 1 + len(embedding)),
              i -> CASE WHEN (i-1) % 32 = 0 THEN 0.0::FLOAT ELSE embedding[i] END)
              AS embedding
          FROM embeddings WHERE vec_id < $NeardupPlanted),
        corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT * FROM twins),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus),
        hc AS (
          SELECT vec_id, v FROM e
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $SemCells),
        cents AS (
          SELECT row_number() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cidx, v
          FROM hc),
        scored AS (
          SELECT e.vec_id, c.cidx,
            list_dot_product(e.v, c.v)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(c.v, c.v))) AS cos
          FROM e CROSS JOIN cents c),
        assign AS (
          SELECT vec_id, cidx AS cell FROM (
            SELECT vec_id, cidx, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, cidx ASC) AS rn
            FROM scored)
          WHERE rn = 1)
        SELECT DISTINCT b.vec_id AS dropped_id, bb.cell
        FROM assign aa
        JOIN assign bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
        JOIN e a ON a.vec_id = aa.vec_id
        JOIN e b ON b.vec_id = bb.vec_id
        WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= $SemThreshold""")),

    // ---- int8 embedding quantization: the ANN-family storage/shuffle
    //      compressor — per-vector symmetric scale q = round(x·127/amax),
    //      4× smaller vectors for the bucket/verify pipelines (quantized
    //      candidates rescore in float at 100 TB; the scale rides along
    //      for dequantization). Oracle-exact arithmetic: the rounding is
    //      the tie-free floor(y + 0.5) form — `round()` half-rule
    //      conventions differ across engines, floor does not — and
    //      every step (float→double widening, one division, one
    //      multiply-add, floor) is the same IEEE op on identical
    //      operands in both engines. Zero vectors keep scale 0 and an
    //      all-zero code (guarded identically). Pure per-row: zero
    //      shuffles, linear at any corpus size.
    //
    //      Gate shape: the registered query serializes the code vector
    //      as a comma-joined string (`q_codes`) — the driver's pandas
    //      row-sort cannot hash array cells (the r7 `err`), so oracle
    //      outputs must stay primitive-only (enforced by
    //      core.OutputLint). Programmatic callers use [[quantizeInt8]]
    //      for the array-valued form. ----
    QueryDef(
      "q86_embedding_quantize",
      (s, d) => {
        quantizeInt8(emb(s, d))
          .select(col("vec_id"), col("scale"),
            array_join(col("q"), ",").as("q_codes"), col("q_amax"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, embedding,
            list_max(list_transform(embedding, x -> abs(x))) AS amax
          FROM embeddings),
        qq AS (
          SELECT vec_id,
            CASE WHEN amax > 0 THEN CAST(amax AS DOUBLE) / 127.0
                 ELSE 0.0 END AS scale,
            CASE WHEN amax > 0 THEN
              list_transform(embedding, x ->
                CAST(floor(CAST(x AS DOUBLE)
                  * (127.0 / CAST(amax AS DOUBLE)) + 0.5) AS INT))
            ELSE list_transform(embedding, x -> 0) END AS q
          FROM e)
        SELECT vec_id, scale,
          array_to_string(q, ',') AS q_codes,
          list_max(list_transform(q, x -> abs(x)))::BIGINT AS q_amax
        FROM qq""")),

    // ---- q100: per-source embedding centroids + drift audit — the
    //      corpus-monitoring query a training pipeline runs per crawl:
    //      each source's mean embedding, its cosine to the global
    //      centroid (drift / outlier sources), and its nearest other
    //      source by centroid cosine (semantic redundancy between
    //      sources). Cross-engine exact by the repo's integer
    //      discipline: coordinates quantize to floor(x·2^20+0.5)
    //      (float→double and ·2^20 are exact IEEE ops), per-(source,
    //      dim) sums are pure bigint, and the centroid is the
    //      trunc-div mean shifted by +2^21 so the numerator is
    //      non-negative (DuckDB `//` and Spark `div` agree on
    //      non-negative operands; embeddings are bounded |x| ≤ 1).
    //      The n/N normalizations cancel in cosine, so every double
    //      in the output is produced by the SAME short op chain
    //      (cast, sqrt, ·, /) from exact ≤2^53 integers.
    //      Scale: the per-dim explode is immediately re-collapsed by
    //      a map-side-combinable (source, dim) sum — the shuffle
    //      carries ≤ S·64 partial rows per task, not 64× the corpus;
    //      everything downstream (centroid matrix S×64, pair dots
    //      S²) is kilobytes and broadcast-joined. ----
    QueryDef(
      "q100_source_centroids",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id").as("vec_id"), col("source"))
        val e = emb(s, d).join(docs, "vec_id")
        val q = e.select(col("source"),
            posexplode(col("embedding")).as(Seq("d", "x")))
          .select(col("source"), col("d"),
            floor(col("x").cast("double") * 1048576.0 + 0.5)
              .cast("long").as("qv"))
        // ONE corpus pass: the vector count rides along with the
        // per-dim sums (every dim's row count IS the vector count),
        // so the scan+join is not re-read for a separate groupBy.
        // NOT persisted: sums fans out to five branches, but they all
        // share one identical exchange — ReusedExchange dedupes the
        // corpus pass already, and an explicit persist measured ~20%
        // SLOWER (materialization overhead for no saved work)
        val sums = q.groupBy("source", "d")
          .agg(sum("qv").as("sq"), count(lit(1)).as("k"))
        val n = sums.filter(col("d") === 0)
          .select(col("source"), col("k").as("n_vecs"))
        val cent = sums.join(broadcast(n), "source")
          .select(col("source"), col("d"),
            expr("(sq + n_vecs * 2097152) div n_vecs - 2097152").as("m"))
        val nTot = n.agg(sum("n_vecs").as("nn")).select(col("nn"))
        val g = sums.groupBy("d").agg(sum("sq").as("gsq"))
          .crossJoin(broadcast(nTot))
          .select(col("d"),
            expr("(gsq + nn * 2097152) div nn - 2097152").as("gm"))
        val sn = cent.groupBy("source")
          .agg(sum(col("m") * col("m")).as("nrm"))
        val gn = g.agg(sum(col("gm") * col("gm")).as("gnrm"))
        val dg = cent.join(broadcast(g), "d")
          .groupBy("source").agg(sum(col("m") * col("gm")).as("dot"))
        val pc = cent.as("a")
          .join(broadcast(cent.as("b")),
            col("a.d") === col("b.d") &&
              col("a.source") =!= col("b.source"))
          .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
          .agg(sum(col("a.m") * col("b.m")).as("pdot"))
          .join(broadcast(sn.select(col("source").as("sa"),
            col("nrm").as("na"))), Seq("sa"))
          .join(broadcast(sn.select(col("source").as("sb"),
            col("nrm").as("nb"))), Seq("sb"))
          .select(col("sa"), col("sb"),
            (col("pdot").cast("double") /
              (sqrt(col("na").cast("double")) *
                sqrt(col("nb").cast("double")))).as("cos"))
        val nn1 = pc.withColumn("rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy("sa").orderBy(col("cos").desc, col("sb"))))
          .filter(col("rk") === 1)
          .select(col("sa").as("source"), col("sb").as("nn_source"),
            col("cos").as("nn_cos"))
        n.join(broadcast(sn), "source")
          .join(broadcast(dg), "source")
          .crossJoin(broadcast(gn))
          .select(col("source"), col("n_vecs"),
            (col("dot").cast("double") /
              (sqrt(col("nrm").cast("double")) *
                sqrt(col("gnrm").cast("double")))).as("cos_global"))
          .join(broadcast(nn1), "source")
      },
      Some("""
        WITH e AS (
          SELECT d.source, em.embedding
          FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id),
        q AS (
          SELECT source,
            unnest(range(0, len(embedding))) AS d,
            unnest(list_transform(range(1, 1 + len(embedding)),
              i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0
                + 0.5) AS BIGINT))) AS qv
          FROM e),
        n AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_vecs
          FROM e GROUP BY source),
        sums AS (
          SELECT source, d, CAST(SUM(qv) AS BIGINT) AS sq
          FROM q GROUP BY source, d),
        cent AS (
          SELECT s.source, s.d,
            CAST((s.sq + n.n_vecs * 2097152) // n.n_vecs
              - 2097152 AS BIGINT) AS m
          FROM sums s JOIN n USING (source)),
        nt AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS nn FROM n),
        g AS (
          SELECT d, CAST((CAST(SUM(sq) AS BIGINT) + nt.nn * 2097152)
            // nt.nn - 2097152 AS BIGINT) AS gm
          FROM sums, nt GROUP BY d, nt.nn),
        sn AS (
          SELECT source, CAST(SUM(m * m) AS BIGINT) AS nrm
          FROM cent GROUP BY source),
        gn AS (SELECT CAST(SUM(gm * gm) AS BIGINT) AS gnrm FROM g),
        dg AS (
          SELECT c.source, CAST(SUM(c.m * g.gm) AS BIGINT) AS dot
          FROM cent c JOIN g USING (d) GROUP BY c.source),
        pc AS (
          SELECT a.source AS sa, b.source AS sb,
            CAST(SUM(a.m * b.m) AS BIGINT)::DOUBLE
              / (sqrt(na.nrm::DOUBLE) * sqrt(nb.nrm::DOUBLE)) AS cos
          FROM cent a
          JOIN cent b ON a.d = b.d AND a.source <> b.source
          JOIN sn na ON na.source = a.source
          JOIN sn nb ON nb.source = b.source
          GROUP BY a.source, b.source, na.nrm, nb.nrm),
        nn1 AS (
          SELECT sa AS source, sb AS nn_source, cos AS nn_cos
          FROM (SELECT sa, sb, cos, row_number() OVER (
              PARTITION BY sa ORDER BY cos DESC, sb) AS rk FROM pc)
          WHERE rk = 1)
        SELECT n.source, n.n_vecs,
          dg.dot::DOUBLE / (sqrt(sn.nrm::DOUBLE) * sqrt(gn.gnrm::DOUBLE))
            AS cos_global,
          nn1.nn_source, nn1.nn_cos
        FROM n
        JOIN sn USING (source)
        JOIN dg USING (source)
        CROSS JOIN gn
        JOIN nn1 USING (source)""")),

    // ---- q105: one Lloyd refinement of a coarse quantizer — the
    //      k-means TRAINING step the ANN/SemDeDup index families
    //      (q31/q78) consume as a finished artifact: seed K=8
    //      centroids deterministically (the 8 smallest vec_ids),
    //      assign every vector to its nearest centroid, recompute
    //      centroids as member means, re-assign, report per-cluster
    //      size + inertia. Cross-engine exact: coordinates quantize to
    //      floor(x·2^20+0.5) bigints, distances are integer squared-L2
    //      folds, means use q100's offset trunc-div, argmin ties break
    //      by smallest centroid id (struct-min in Spark, row_number in
    //      DuckDB — same total order); the one double output is a
    //      single IEEE division of identical exact operands.
    //      Scale: BOTH assignment passes are zero-shuffle scans — the
    //      K-row centroid table rides a one-row broadcast as an
    //      array<struct>, argmin is a per-row fold (never a corpus×K
    //      shuffle); the update step's only exchange is the
    //      map-side-combinable (cluster, dim) sum, ≤ K·dims partials
    //      per task. The plan an in-engine index-train loop should
    //      compile to at 100 TB; more iterations = repeat the same
    //      two stages. ----
    QueryDef(
      "q105_kmeans_refine",
      (s, d) => {
        // conditional input spread (no-op on a parallel scan): both
        // broadcast-assign passes fold 8×64-long distances per row off
        // the scan's single task otherwise
        val qe = graft.operators.InputSpread
          .byKey(emb(s, d), col("vec_id"))
          .select(col("vec_id"),
          transform(col("embedding"), x =>
            floor(x.cast("double") * 1048576.0 + 0.5).cast("long"))
            .as("qv"))
        def sqdist(a: Column, b: Column): Column =
          aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, v) => acc + v)
        // seeds: ONE row carrying cents = array<struct<sid, sv>>;
        // argmin by (dist, sid) via array_min's struct ordering, so
        // assignment is a broadcast + per-row fold — zero shuffles
        def assign(vecs: DataFrame, seeds: DataFrame): DataFrame = {
          val best = array_min(transform(col("cents"), c =>
            struct(sqdist(col("qv"), c.getField("sv")).as("dd"),
              c.getField("sid").as("sid"))))
          vecs.crossJoin(broadcast(seeds))
            .select(col("vec_id"), col("qv"),
              best.getField("sid").as("c"),
              best.getField("dd").as("dd"))
        }
        val seeds0 = qe.orderBy("vec_id").limit(8)
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("sid"), col("qv").as("sv")))).as("cents"))
        val a1 = assign(qe, seeds0)
        val m1 = a1
          .select(col("c"), posexplode(col("qv")).as(Seq("d", "x")))
          .groupBy("c", "d")
          .agg(sum("x").as("sx"), count(lit(1)).as("k"))
          .select(col("c"), col("d"),
            expr("(sx + k * 2097152) div k - 2097152").as("m"))
        val seeds1 = m1.groupBy("c")
          .agg(transform(
            sort_array(collect_list(struct(col("d"), col("m")))),
            p => p.getField("m")).as("sv"))
          .agg(sort_array(collect_list(struct(
            col("c").as("sid"), col("sv").as("sv")))).as("cents"))
        val a2 = assign(qe, seeds1)
        a2.groupBy(col("c").as("cluster"))
          .agg(count(lit(1)).as("n_vecs"), sum("dd").as("inertia"))
          .select(col("cluster"), col("n_vecs"), col("inertia"),
            (col("inertia").cast("double") /
              col("n_vecs").cast("double")).as("mean_dist"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
            AS qv
          FROM embeddings),
        s0 AS (
          SELECT vec_id AS sid, qv AS sv FROM e ORDER BY vec_id LIMIT 8),
        d1 AS (
          SELECT e.vec_id, s0.sid,
            CAST(list_sum(list_transform(range(1, 1 + len(e.qv)),
              i -> (e.qv[i] - s0.sv[i]) * (e.qv[i] - s0.sv[i])))
              AS BIGINT) AS dist
          FROM e CROSS JOIN s0),
        a1 AS (
          SELECT vec_id, sid AS c, dist FROM (
            SELECT vec_id, sid, dist, row_number() OVER (
              PARTITION BY vec_id ORDER BY dist, sid) AS rk FROM d1)
          WHERE rk = 1),
        q1 AS (
          SELECT a.c, unnest(range(0, len(e.qv))) AS d,
            unnest(e.qv) AS x
          FROM e JOIN a1 a USING (vec_id)),
        m1 AS (
          SELECT c, d, CAST((CAST(SUM(x) AS BIGINT)
              + CAST(count(*) AS BIGINT) * 2097152)
            // CAST(count(*) AS BIGINT) - 2097152 AS BIGINT) AS m
          FROM q1 GROUP BY c, d),
        s1 AS (
          SELECT c AS sid, list(m ORDER BY d) AS sv FROM m1 GROUP BY c),
        d2 AS (
          SELECT e.vec_id, s1.sid,
            CAST(list_sum(list_transform(range(1, 1 + len(e.qv)),
              i -> (e.qv[i] - s1.sv[i]) * (e.qv[i] - s1.sv[i])))
              AS BIGINT) AS dist
          FROM e CROSS JOIN s1),
        a2 AS (
          SELECT vec_id, sid AS c, dist FROM (
            SELECT vec_id, sid, dist, row_number() OVER (
              PARTITION BY vec_id ORDER BY dist, sid) AS rk FROM d2)
          WHERE rk = 1)
        SELECT c AS cluster, CAST(count(*) AS BIGINT) AS n_vecs,
          CAST(SUM(dist) AS BIGINT) AS inertia,
          CAST(SUM(dist) AS BIGINT)::DOUBLE
            / CAST(count(*) AS BIGINT)::DOUBLE AS mean_dist
        FROM a2 GROUP BY c""")),

    // ---- q107: embedding health audit — the per-source data-quality
    //      gate an embedding pipeline runs before any ANN/dedup stage
    //      consumes the table: vector counts, zero/degenerate vectors
    //      (a broken encoder emits them; they poison cosine), ragged
    //      dimensionality (min/max length must agree), and the
    //      squared-norm envelope (min/mean/max — drift here means the
    //      encoder changed normalization). Integer-exact: norms are
    //      bigint folds over floor(x·2^20+0.5) coords; the mean is
    //      ONE IEEE division. Scale: the norm fold is per-row (zero
    //      shuffles), the rollup one map-side-combinable source-keyed
    //      aggregate — a linear scan at any corpus size. ----
    QueryDef(
      "q107_embedding_health",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id").as("vec_id"), col("source"))
        val per = emb(s, d).join(docs, "vec_id")
          .select(col("source"),
            size(col("embedding")).cast("long").as("dims"),
            aggregate(
              transform(col("embedding"), x =>
                floor(x.cast("double") * 1048576.0 + 0.5).cast("long")),
              lit(0L), (acc, v) => acc + v * v).as("qn"))
        per.groupBy("source")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("qn") === 0L, 1L).otherwise(0L))
              .as("zero_vecs"),
            min("dims").as("min_dims"), max("dims").as("max_dims"),
            min("qn").as("min_qnorm"), max("qn").as("max_qnorm"),
            sum("qn").as("sum_qnorm"))
          .select(col("source"), col("n_vecs"), col("zero_vecs"),
            col("min_dims"), col("max_dims"),
            col("min_qnorm"), col("max_qnorm"),
            (col("sum_qnorm").cast("double") /
              col("n_vecs").cast("double")).as("mean_qnorm"))
      },
      Some("""
        WITH per AS (
          SELECT d.source,
            CAST(len(em.embedding) AS BIGINT) AS dims,
            CAST(list_sum(list_transform(em.embedding, x ->
              CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT)
              * CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5)
                AS BIGINT))) AS BIGINT) AS qn
          FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id)
        SELECT source, CAST(count(*) AS BIGINT) AS n_vecs,
          CAST(SUM(CASE WHEN qn = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS zero_vecs,
          CAST(MIN(dims) AS BIGINT) AS min_dims,
          CAST(MAX(dims) AS BIGINT) AS max_dims,
          CAST(MIN(qn) AS BIGINT) AS min_qnorm,
          CAST(MAX(qn) AS BIGINT) AS max_qnorm,
          CAST(SUM(qn) AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE
            AS mean_qnorm
        FROM per GROUP BY source""")),

    // ---- q117: product-quantization ADC search (Jégou et al. 2011)
    //      — the memory-side of the ANN family: q31's IVF prunes the
    //      SCAN, PQ compresses the RESIDENT vectors (4 subspaces × 16
    //      dims → one 4-byte code word per vector, a 64× compression
    //      of the float corpus) and scores probes against codes with
    //      per-probe lookup tables, never touching the original
    //      vectors. Deterministic codebook: the 16 lowest vec_ids'
    //      subvectors (the trained upgrade is q105's Lloyd step per
    //      subspace — same plan shape). Integer-exact end to end:
    //      coords floor(x·2^20+0.5), code = argmin of bigint
    //      subspace-L2 (ties by codebook position), ADC = Σ_m
    //      lut[m][code_m]. Scale: the codebook is a one-row broadcast
    //      (encode is a zero-shuffle scan — the corpus-sized pass);
    //      probe LUTs broadcast (4×16 longs per probe); scoring
    //      touches only (vec_id, 4 codes) rows. For large probe sets,
    //      IVF-prefilter (q31) then PQ-score the surviving cells. ----
    QueryDef(
      "q117_pq_search",
      (s, d) => {
        // conditional input spread (no-op on a parallel scan): the
        // encode pass folds 4×16 sub-distances against 16 seeds per
        // row off the scan's single task otherwise
        val qe = graft.operators.InputSpread
          .byKey(emb(s, d), col("vec_id"))
          .select(col("vec_id"),
          transform(col("embedding"), x =>
            floor(x.cast("double") * 1048576.0 + 0.5).cast("long"))
            .as("qv"))
        def sub(c: Column, m: Int): Column = slice(c, m * 16 + 1, 16)
        def sqd(a: Column, b: Column): Column =
          aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, v) => acc + v)
        val seedsRow = qe.orderBy("vec_id").limit(16)
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("sid"), col("qv").as("sv")))).as("seeds"))
        val enc = qe.crossJoin(broadcast(seedsRow))
          .select(col("vec_id"),
            array((0 until 4).map { m =>
              array_min(transform(col("seeds"), (sd, i) =>
                struct(sqd(sub(col("qv"), m), sub(sd.getField("sv"), m))
                  .as("dd"), i.cast("long").as("k"))))
                .getField("k")
            }: _*).as("codes"))
        val probes = qe.filter(col("vec_id") % 50 === 0)
          .crossJoin(broadcast(seedsRow))
          .select(col("vec_id").as("probe_id"),
            array((0 until 4).map { m =>
              transform(col("seeds"), sd =>
                sqd(sub(col("qv"), m), sub(sd.getField("sv"), m)))
            }: _*).as("luts"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("adist"), col("neighbor_id"))
        enc.crossJoin(broadcast(probes))
          .filter(col("probe_id") =!= col("vec_id"))
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            expr("luts[0][int(codes[0])] + luts[1][int(codes[1])]" +
              " + luts[2][int(codes[2])] + luts[3][int(codes[3])]")
              .as("adist"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
      },
      Some("""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
            AS qv
          FROM embeddings),
        seeds AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, qv AS sv
          FROM e ORDER BY vec_id LIMIT 16),
        ms AS (SELECT unnest(range(0, 4)) AS m),
        enc AS (
          SELECT e.vec_id, ms.m, s.k,
            CAST(list_sum(list_transform(range(1, 17), i ->
              (e.qv[ms.m*16+i] - s.sv[ms.m*16+i])
              * (e.qv[ms.m*16+i] - s.sv[ms.m*16+i]))) AS BIGINT) AS dd
          FROM e CROSS JOIN ms CROSS JOIN seeds s),
        codes AS (
          SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k, dd, row_number() OVER (
              PARTITION BY vec_id, m ORDER BY dd, k) AS rk FROM enc)
          WHERE rk = 1),
        probes AS (SELECT vec_id AS probe_id, qv FROM e
          WHERE vec_id % 50 = 0),
        plut AS (
          SELECT p.probe_id, ms.m, s.k,
            CAST(list_sum(list_transform(range(1, 17), i ->
              (p.qv[ms.m*16+i] - s.sv[ms.m*16+i])
              * (p.qv[ms.m*16+i] - s.sv[ms.m*16+i]))) AS BIGINT) AS dd
          FROM probes p CROSS JOIN ms CROSS JOIN seeds s),
        scored AS (
          SELECT pl.probe_id, c.vec_id AS neighbor_id,
            CAST(SUM(pl.dd) AS BIGINT) AS adist
          FROM codes c JOIN plut pl ON pl.m = c.m AND pl.k = c.code
          WHERE c.vec_id <> pl.probe_id
          GROUP BY 1, 2)
        SELECT probe_id, neighbor_id, adist, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY adist, neighbor_id) AS BIGINT) AS rk
          FROM scored)
        WHERE rk <= 5""")),

    // ---- q118: source-affinity matrix — pairwise cosine between
    //      per-source embedding centroids, the redundancy map a
    //      mixing pipeline reads before setting source weights (two
    //      sources with cos ≈ 1 are the same content pool; q94/q95
    //      budgets should treat them jointly). Centroids use q100's
    //      exact offset trunc-div means (then a second positive-offset
    //      shift to ±2048 so every product stays far inside bigint);
    //      the one double per pair is dot/√(na²·nb²) — IEEE sqrt and
    //      divide are correctly-rounded, so bit-identical cross-engine
    //      on identical bigint operands. Scale: ONE corpus-sized
    //      map-side-combinable (source, dim) sum; the S×S cross join
    //      is over a broadcast S·64-long table — negligible at any
    //      corpus size (S = source count). ----
    QueryDef(
      "q118_source_affinity",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id").as("vec_id"), col("source"))
        val cent = emb(s, d).join(docs, "vec_id")
          .select(col("source"),
            posexplode(transform(col("embedding"), x =>
              floor(x.cast("double") * 1048576.0 + 0.5).cast("long")))
              .as(Seq("dm", "x")))
          .groupBy("source", "dm")
          .agg(sum("x").as("sx"), count(lit(1)).as("k"))
          .select(col("source"), col("dm"),
            expr("((sx + k * 2097152) div k - 2097152 + 2097152)" +
              " div 1024 - 2048").as("c"))
        val cvec = cent.groupBy("source")
          .agg(transform(
            sort_array(collect_list(struct(col("dm"), col("c")))),
            p => p.getField("c")).as("cv"))
        val a = cvec.select(col("source").as("src_a"), col("cv").as("ca"))
        val b = cvec.select(col("source").as("src_b"), col("cv").as("cb"))
        def dotp(x: Column, y: Column): Column =
          aggregate(zip_with(x, y, (u, v) => u * v),
            lit(0L), (acc, v) => acc + v)
        a.join(broadcast(b), col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"),
            dotp(col("ca"), col("cb")).as("dot"),
            dotp(col("ca"), col("ca")).as("na2"),
            dotp(col("cb"), col("cb")).as("nb2"))
          .select(col("src_a"), col("src_b"), col("dot"), col("na2"),
            col("nb2"),
            when(col("na2") > 0 && col("nb2") > 0,
              col("dot").cast("double") /
                sqrt((col("na2") * col("nb2")).cast("double")))
              .as("cosine"))
      },
      Some("""
        WITH q AS (
          SELECT d.source, unnest(range(0, len(em.embedding))) AS dm,
            unnest(list_transform(em.embedding, x ->
              CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT)))
              AS x
          FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id),
        cent AS (
          SELECT source, dm,
            ((CAST(SUM(x) AS BIGINT) + CAST(count(*) AS BIGINT) * 2097152)
              // CAST(count(*) AS BIGINT) - 2097152 + 2097152)
              // 1024 - 2048 AS c
          FROM q GROUP BY source, dm),
        cv AS (
          SELECT source, list(c ORDER BY dm) AS cv FROM cent
          GROUP BY source),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
            CAST(list_sum(list_transform(range(1, 1 + len(a.cv)),
              i -> a.cv[i] * b.cv[i])) AS BIGINT) AS dot,
            CAST(list_sum(list_transform(a.cv, v -> v * v)) AS BIGINT)
              AS na2,
            CAST(list_sum(list_transform(b.cv, v -> v * v)) AS BIGINT)
              AS nb2
          FROM cv a JOIN cv b ON a.source < b.source)
        SELECT src_a, src_b, dot, na2, nb2,
          CASE WHEN na2 > 0 AND nb2 > 0
            THEN CAST(dot AS DOUBLE)
              / sqrt(CAST(na2 * nb2 AS DOUBLE))
            ELSE NULL END AS cosine
        FROM pairs""")),

    // ---- q139: margin-based bitext / pair mining (Artetxe & Schwenk
    //      2019): pair each left-pool vector with the right-pool vector
    //      maximizing the RATIO margin — cos(x,y) normalized by the
    //      mean of both sides' top-k neighborhoods — instead of raw
    //      cosine, which over-selects hub vectors that are near
    //      everything. Demonstrated exactly on a bounded pool (the
    //      q24 discipline); at 100 TB the pair candidates come from the
    //      ANN families (q25/q31) and the SAME candidate table feeds
    //      both directions' top-k sums — two bounded windows keyed by
    //      either endpoint, never a second corpus pass.
    //      Cross-engine exact: cosines quantize to floor(cos·2^40+0.5)
    //      bigints BEFORE any sum (integer sums are order-free; a raw
    //      double top-k sum would depend on fold order), and the margin
    //      is ONE division of exact ≤2^43 integer operands. ----
    QueryDef(
      "q139_bitext_margin",
      (s, d) => {
        val k = 4
        val pool = emb(s, d).filter(col("vec_id") < 400)
        val a = pool.filter(col("label") < 5)
          .select(col("vec_id").as("a_id"), col("embedding").as("va"))
        val b = pool.filter(col("label") >= 5)
          .select(col("vec_id").as("b_id"), col("embedding").as("vb"))
        val p = a.join(broadcast(b), col("a_id") =!= col("b_id"))
          .select(col("a_id"), col("b_id"),
            floor(cosine(col("va"), col("vb")) * 1099511627776.0 + 0.5)
              .cast("long").as("qcos"))
        val wa = Window.partitionBy("a_id")
          .orderBy(col("qcos").desc, col("b_id"))
        val wb = Window.partitionBy("b_id")
          .orderBy(col("qcos").desc, col("a_id"))
        val sumA = p.withColumn("rn", row_number().over(wa))
          .filter(col("rn") <= k)
          .groupBy("a_id").agg(sum(col("qcos")).as("sum_a"))
        val sumB = p.withColumn("rn", row_number().over(wb))
          .filter(col("rn") <= k)
          .groupBy("b_id").agg(sum(col("qcos")).as("sum_b"))
        val m = p.join(sumA, Seq("a_id")).join(sumB, Seq("b_id"))
          .withColumn("margin",
            (col("qcos") * 2 * k).cast("double") /
              (col("sum_a") + col("sum_b")).cast("double"))
        val wBest = Window.partitionBy("a_id")
          .orderBy(col("margin").desc, col("b_id"))
        m.withColumn("rk", row_number().over(wBest))
          .filter(col("rk") === 1 && col("margin") > 1.0)
          .select(col("a_id"), col("b_id"), col("qcos"), col("margin"))
      },
      Some("""
        WITH pool AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS v
          FROM embeddings WHERE vec_id < 400),
        a AS (SELECT vec_id AS a_id, v AS va FROM pool WHERE label < 5),
        b AS (SELECT vec_id AS b_id, v AS vb FROM pool WHERE label >= 5),
        p AS (
          SELECT a_id, b_id,
            CAST(floor(list_dot_product(va, vb)
              / (sqrt(list_dot_product(va, va))
                 * sqrt(list_dot_product(vb, vb)))
              * 1099511627776.0 + 0.5) AS BIGINT) AS qcos
          FROM a, b WHERE a_id <> b_id),
        sa AS (
          SELECT a_id, CAST(SUM(qcos) AS BIGINT) AS sum_a
          FROM (SELECT *, row_number() OVER (PARTITION BY a_id
              ORDER BY qcos DESC, b_id) AS rn FROM p)
          WHERE rn <= 4 GROUP BY a_id),
        sb AS (
          SELECT b_id, CAST(SUM(qcos) AS BIGINT) AS sum_b
          FROM (SELECT *, row_number() OVER (PARTITION BY b_id
              ORDER BY qcos DESC, a_id) AS rn FROM p)
          WHERE rn <= 4 GROUP BY b_id),
        m AS (
          SELECT p.a_id, p.b_id, p.qcos,
            CAST(p.qcos * 8 AS DOUBLE) / CAST(sum_a + sum_b AS DOUBLE)
              AS margin
          FROM p JOIN sa USING (a_id) JOIN sb USING (b_id)),
        best AS (
          SELECT *, row_number() OVER (PARTITION BY a_id
            ORDER BY margin DESC, b_id) AS rk
          FROM m)
        SELECT a_id, b_id, qcos, margin
        FROM best WHERE rk = 1 AND margin > 1.0""")),

    // ---- q166: embedding covariance sufficient statistics — the
    //      dimension-correlation audit behind whitening / redundancy
    //      detection (are dims carrying independent signal?). Every
    //      element is quantized to an exact integer (round(x·10⁴)),
    //      then for each dim pair i <= j the EXACT int64 sufficient
    //      stats (n, Σqᵢ, Σqⱼ, Σqᵢqⱼ) and the covariance numerator
    //      n·Σqᵢqⱼ − Σqᵢ·Σqⱼ ship — the consumer divides by n² at
    //      whatever precision it wants; nothing float crosses the
    //      engine boundary.
    //
    //      Scale shape: one posexplode pass (n·d rows), a vec_id-keyed
    //      self-join whose per-key fan-out is exactly d²/2 (d is a
    //      constant, so the join output is linear in n), map-side-
    //      combined (i, j) sums — d²/2 output rows total. Magnitudes:
    //      |q| <= ~10⁴, products <= 10⁸, n·Σ <= ~10¹⁵ at sf0.1 — all
    //      inside int64 with three orders of headroom. ----
    QueryDef(
      "q166_embedding_cov",
      (s, d) => {
        val q = emb(s, d)
          .select(col("vec_id"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          // cast to double BEFORE the multiply: float×int arithmetic
          // differs between engines on elements whose scaled value
          // lands on a half — double×double is bit-identical
          .select(col("vec_id"), col("i"),
            round(col("x").cast("double") * 10000).cast("long").as("q"))
        q.select(col("vec_id"), col("i").as("di"), col("q").as("qi"))
          .join(q.select(col("vec_id"), col("i").as("dj"),
            col("q").as("qj")), Seq("vec_id"))
          .filter(col("di") <= col("dj"))
          .groupBy("di", "dj")
          .agg(count(lit(1)).as("n"),
            sum(col("qi")).as("s_i"),
            sum(col("qj")).as("s_j"),
            sum(col("qi") * col("qj")).as("s_ij"))
          .withColumn("cov_num",
            col("n") * col("s_ij") - col("s_i") * col("s_j"))
          .select(col("di").cast("long").as("di"),
            col("dj").cast("long").as("dj"),
            col("n"), col("s_i"), col("s_j"), col("s_ij"),
            col("cov_num"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
          FROM embeddings),
        ex AS (
          SELECT vec_id,
            unnest(generate_series(0, len(q) - 1)) AS i,
            unnest(q) AS qv
          FROM e),
        pairs AS (
          SELECT a.i AS di, b.i AS dj, a.qv AS qi, b.qv AS qj
          FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i),
        agg AS (
          SELECT CAST(di AS BIGINT) AS di, CAST(dj AS BIGINT) AS dj,
            COUNT(*) AS n,
            CAST(SUM(qi) AS BIGINT) AS s_i,
            CAST(SUM(qj) AS BIGINT) AS s_j,
            CAST(SUM(qi * qj) AS BIGINT) AS s_ij
          FROM pairs GROUP BY 1, 2)
        SELECT di, dj, n, s_i, s_j, s_ij,
          n * s_ij - s_i * s_j AS cov_num
        FROM agg""")),

    // ---- q233: scaled-integer power iteration — the top principal
    //      direction of the embedding Gram matrix by TWO exact
    //      matrix-vector steps (q186's integer-power-iteration idea
    //      applied to dense linear algebra): S = Σ q qᵀ over coarse
    //      integer codes (round(x·100)), x₁ = 1, x₂ = S·x₁,
    //      x₃ = S·(x₂ div 2¹⁰). The block-floating rescale keeps every
    //      product in int64 through sf10 (grow the shift by
    //      log₂(rows) beyond that); the RATIOS of x₃ — what a
    //      whitening/ABE consumer reads — already rank the dims by
    //      principal loading, and nothing float ever crosses the
    //      engines. Scale: S is never materialized — both
    //      matrix-vector steps FACTOR through per-vector scalars
    //      ((Σqqᵀ)·x = Σ q·⟨q,x⟩, exact under integer arithmetic), so
    //      each step is one narrow pass over the vectors + a d-sized
    //      aggregate, and the d²×N pair shuffle the naive S build
    //      pays never exists. The d²-bounded join form (q166) remains
    //      the shape for consumers that need S ITSELF. ----
    QueryDef(
      "q233_power_iteration",
      (s, d) => {
        // NOT spread: a vec_id repartition before powerSteps was
        // A/B-measured SLOWER in the same-window suite (0.76 → 1.12 s
        // at sf0.1) — the 2k-vector kernel is too small to amortize
        // the exchange. Reverted r13.
        val quantized = emb(s, d)
          .select(col("vec_id"),
            transform(col("embedding"),
              x => round(x.cast("double") * 100).cast("long")).as("q"))
        val (x2, x3) = powerSteps(quantized)
        x2.join(x3, Seq("i"))
          .select(col("i").cast("long").as("di"), col("x2"),
            col("x2s"), col("x3"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS q
          FROM embeddings),
        ex AS (
          SELECT vec_id,
            unnest(generate_series(0, len(q) - 1)) AS i,
            unnest(q) AS qv
          FROM e),
        S AS (
          SELECT a.i AS di, b.i AS dj,
            CAST(SUM(a.qv * b.qv) AS BIGINT) AS s
          FROM ex a JOIN ex b ON a.vec_id = b.vec_id
          GROUP BY 1, 2),
        x2 AS (
          SELECT di, CAST(SUM(s) AS BIGINT) AS x2,
            CAST(SUM(s) AS BIGINT) // 1024 AS x2s
          FROM S GROUP BY 1),
        x3 AS (
          SELECT S.di, CAST(SUM(S.s * x2.x2s) AS BIGINT) AS x3
          FROM S JOIN x2 ON x2.di = S.dj
          GROUP BY 1)
        SELECT CAST(x2.di AS BIGINT) AS di, x2.x2, x2.x2s, x3.x3
        FROM x2 JOIN x3 ON x2.di = x3.di""")),

    // ---- q244: negative-sampling audit — contrastive training draws
    //      "in-batch" negatives from hash buckets; this measures what
    //      that buys: per bucket (vec_id mod 32), each anchor takes
    //      its 4 deterministically-ranked bucket-mates (md5 of the
    //      ordered id pair — reproducible anywhere) and the audit
    //      reports how often a sampled negative shares the anchor's
    //      LABEL (a false negative for the loss). Pair fan-out is
    //      bounded by bucket size; the rank window keys by anchor.
    //      The check that decides bucket size and whether hard-
    //      negative mining needs label filtering. ----
    QueryDef(
      "q244_negative_sampling",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = emb(s, d)
          .select(col("vec_id"), col("label"),
            (col("vec_id") % 32).as("bkt"))
        val pairs = v.select(col("bkt"), col("vec_id").as("a"),
            col("label").as("la"))
          .join(v.select(col("bkt"), col("vec_id").as("c"),
            col("label").as("lc")), Seq("bkt"))
          .filter(col("a") =!= col("c"))
          .withColumn("rk_key",
            md5(concat_ws(":", col("a"), col("c"))))
        val w = Window.partitionBy("a").orderBy("rk_key")
        pairs
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .groupBy("bkt")
          .agg(countDistinct(col("a")).as("n_anchors"),
            count(lit(1)).as("n_negatives"),
            sum((col("la") === col("lc")).cast("long"))
              .as("n_label_collisions"))
          .withColumn("collision_ppm",
            expr("n_label_collisions * 1000000 div n_negatives"))
      },
      Some("""
        WITH v AS (
          SELECT vec_id, label, vec_id % 32 AS bkt FROM embeddings),
        p AS (
          SELECT a.bkt, a.vec_id AS a, a.label AS la,
            b.vec_id AS c, b.label AS lc,
            md5(CAST(a.vec_id AS VARCHAR) || ':'
              || CAST(b.vec_id AS VARCHAR)) AS rk_key
          FROM v a JOIN v b ON a.bkt = b.bkt
            AND a.vec_id <> b.vec_id),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY a
            ORDER BY rk_key) AS rn
          FROM p)
        SELECT bkt,
          CAST(COUNT(DISTINCT a) AS BIGINT) AS n_anchors,
          COUNT(*) AS n_negatives,
          CAST(SUM(CASE WHEN la = lc THEN 1 ELSE 0 END) AS BIGINT)
            AS n_label_collisions,
          CAST(SUM(CASE WHEN la = lc THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000 // COUNT(*) AS collision_ppm
        FROM r WHERE rn <= 4 GROUP BY bkt""")),

    // ---- q315: matryoshka truncation audit — how much of the
    //      corpus's embedding energy lives in the first k dimensions
    //      (k ∈ {8, 16, 32, 64})? The dimension-budget question MRL
    //      training (Kusupati et al. 2022) answers by construction
    //      and a storage planner asks before truncating an index.
    //      Repo integer discipline: coordinates quantize to
    //      floor(x·2^20 + 0.5) (exact IEEE ops), per-row prefix
    //      energies are int64 HOF folds over the quantized array
    //      (never an explode), the corpus-level fraction is the
    //      ratio of two exact integer sums, and the per-row "≥ 90%
    //      in-prefix" census is the cross-multiplication
    //      10·e_k ≥ 9·e_64. The four budget arms re-project the
    //      quantized column independently (embeddings are the lake's
    //      smallest table; at larger scale the quantized projection
    //      would persist once, q21's pattern). ----
    QueryDef(
      "q315_matryoshka_energy",
      (s, d) => {
        val q = emb(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
            " * 1048576.0 + 0.5) AS BIGINT))").as("q"))
          .withColumn("e64",
            expr("aggregate(q, 0L, (a, x) -> a + x * x)"))
        Seq(8, 16, 32, 64).map { k =>
          q.withColumn("ek",
            expr(s"aggregate(slice(q, 1, $k), 0L, (a, x) -> a + x * x)"))
            .agg(count(lit(1)).as("n_vecs"),
              sum(col("ek")).as("energy_k"),
              sum(col("e64")).as("energy_full"),
              sum(when(expr("10 * ek >= 9 * e64"), 1L).otherwise(0L))
                .as("n_ge90"))
            .select(lit(k.toLong).as("k"), col("n_vecs"),
              col("energy_k"), col("energy_full"), col("n_ge90"),
              expr("CAST(energy_k AS DOUBLE)" +
                " / CAST(energy_full AS DOUBLE)").as("energy_frac"))
        }.reduce(_.unionByName(_))
      },
      Some("""
        WITH q AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
              * 1048576.0 + 0.5) AS BIGINT)) AS q
          FROM embeddings),
        e AS (
          SELECT vec_id, q,
            CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT)
              AS e64
          FROM q),
        ks AS (SELECT unnest([8, 16, 32, 64]) AS k),
        per AS (
          SELECT ks.k, e.vec_id, e.e64,
            CAST(list_sum(list_transform(e.q[1:ks.k], x -> x * x))
              AS BIGINT) AS ek
          FROM e, ks)
        SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS n_vecs,
          CAST(SUM(ek) AS BIGINT) AS energy_k,
          CAST(SUM(e64) AS BIGINT) AS energy_full,
          CAST(SUM(CASE WHEN 10 * ek >= 9 * e64 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ge90,
          CAST(CAST(SUM(ek) AS BIGINT) AS DOUBLE)
            / CAST(CAST(SUM(e64) AS BIGINT) AS DOUBLE) AS energy_frac
        FROM per GROUP BY k""")),
  )

  /** Per-vector symmetric int8 quantization (array-valued API): scale =
    * amax/127, codes q_i = floor(x_i·127/amax + 0.5) ∈ [-127, 127]; zero
    * vectors keep scale 0 and an all-zero code. Pure per-row — zero
    * shuffles at any corpus size. The registered q86 gate query wraps
    * this with a comma-joined `q_codes` string (driver-comparable);
    * the dequantization round-trip bound |x − q·scale| ≤ scale/2 is
    * SimilaritySpec-tested against this array form.
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val amax = array_max(transform(col("embedding"), x => abs(x)))
    embeddings
      .withColumn("amax", amax)
      .withColumn("scale",
        when(col("amax") > 0,
          col("amax").cast("double") / 127.0).otherwise(0.0))
      .withColumn("q",
        when(col("amax") > 0,
          transform(col("embedding"),
            x => floor(x.cast("double") * (lit(127.0) /
              col("amax").cast("double")) + 0.5).cast("int")))
          .otherwise(transform(col("embedding"), _ => lit(0))))
      .select(col("vec_id"), col("scale"), col("q"),
        array_max(transform(col("q"), x => abs(x))).cast("long")
          .as("q_amax"))
  }
}
