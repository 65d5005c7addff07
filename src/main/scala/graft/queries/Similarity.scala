package graft.queries

import org.apache.spark.sql.DataFrame
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

  private def emb(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")

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
    * cosine re-rank of candidates only.
    */
  def annTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    def withBuckets(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(
          col("vec_id").as(idAs),
          col("embedding").as(vecAs),
          explode(lshBuckets(col("embedding"), Dim, Tables, BitsPerTable))
            .as("bucket"))
    val p = withBuckets(probes, "probe_id", "pv")
    val c = withBuckets(corpus, "neighbor_id", "cv")
    val w = Window
      .partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    p.join(c, Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .dropDuplicates("probe_id", "neighbor_id")
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cos")
  }

  def defs: Seq[QueryDef] = Seq(
    // ---- Exact top-k baseline, DuckDB-oracle-checked. Output is
    //      (probe, rank, neighbor) — rank ties broken by id; cosine is
    //      computed identically (double fold over float elements) in
    //      both engines. ----
    QueryDef(
      "q24_knn_brute",
      (s, d) => {
        val e = emb(s, d)
        bruteForceTopK(e.filter(col("vec_id") < NumProbes), e, TopK)
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

    // ---- LSH ANN (rows-only check; recall vs q24 asserted in
    //      SimilaritySpec) ----
    QueryDef(
      "q25_ann_lsh",
      (s, d) => {
        val e = emb(s, d)
        annTopK(e.filter(col("vec_id") < NumProbes), e, TopK)
          .select("probe_id", "rank", "neighbor_id")
      },
      None),

    // ---- Embedding-cosine near-dup pairs via LSH buckets (rows-only;
    //      the synthetic corpus has no cos>0.6 pairs, so the threshold
    //      targets the top of the observed distribution) ----
    QueryDef(
      "q26_embedding_neardup",
      (s, d) => {
        val e = emb(s, d).select(
          col("vec_id"),
          col("embedding"),
          explode(lshBuckets(col("embedding"), Dim, Tables, BitsPerTable))
            .as("bucket"))
        val a = e.select(
          col("bucket"),
          col("vec_id").as("id_a"),
          col("embedding").as("v_a"))
        val b = e.select(
          col("bucket"),
          col("vec_id").as("id_b"),
          col("embedding").as("v_b"))
        a.join(b, Seq("bucket"))
          .filter(col("id_a") < col("id_b"))
          .dropDuplicates("id_a", "id_b")
          .withColumn("cos", cosine(col("v_a"), col("v_b")))
          .filter(col("cos") >= 0.45)
          .select("id_a", "id_b", "cos")
      },
      None))
}
