package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end batch corpus-curation job: the certified curation
  * operators composed into the ONE pipeline a training-data user
  * actually runs — raw documents in, a partitioned training-ready lake
  * out. Each stage is an already-oracle-certified operator (the q-pack
  * citations below); this job is their composition plus the write
  * layout.
  *
  *   1. quality gates   — Gopher repetition rules (q73) + C4 ratio
  *                        cuts (q17): rejects never pay later stages
  *   2. PII redaction   — q74, applied BEFORE fingerprinting so masked
  *                        re-crawls dedup together
  *   3. exact dedup     — q20 canonical-fingerprint keep-first
  *   4. budget sampling — q75 per-source dyadic keep-rates with
  *                        importance weights
  *   5. hash split      — q53 deterministic 80/10/10 train/val/test
  *   6. write           — one parquet lake partitioned by
  *                        (split, source): training readers prune to
  *                        their split, per-source mixing reads one
  *                        subtree
  *
  * Scale shape: stages 1, 2, 4 and 5 are pure per-row expressions
  * (zero shuffles, codegen'd); stage 3 is ONE fingerprint-keyed
  * shuffle whose payload is (fp, doc_id) — the text re-attaches to
  * survivors by id; the write repartitions by the output partition
  * columns so each (split, source) lands in contiguous files. Nothing
  * collects; every stage is linear at 100 TB.
  */
object CorpusCuration {

  /** Per-source keep threshold out of 256 for the default fixture
    * naming ("srcN"): the q75 dyadic rate table by source index mod 4.
    * Sources that don't parse keep EVERYTHING (threshold 256, weight
    * 1) — a sampling stage must never silently down-sample a source it
    * doesn't recognize; pass a custom `sourceThreshold` for real
    * corpora.
    */
  def defaultSourceThreshold: org.apache.spark.sql.Column = {
    // try_cast: unrecognized source names must fall through to the
    // keep-everything branch, not fail the job under ANSI mode
    val srcIdx = expr("try_cast(substring(source, 4, 10) AS INT)") % 4
    when(srcIdx === 0, 256).when(srcIdx === 1, 128)
      .when(srcIdx === 2, 192).when(srcIdx === 3, 64)
      .otherwise(256)
  }

  /** Stages 1–5; returns the curated frame with (split, weight) and
    * every gate's decision columns dropped.
    *
    * Documents shorter than 3 whitespace tokens are ALWAYS rejected:
    * the repetition gate (q73 semantics) needs at least one 3-gram to
    * score a document, and sub-3-token fragments are not training
    * documents — this is a deliberate minimum-length gate, independent
    * of the thresholds.
    */
  def curate(docs: DataFrame,
      maxTopTokenFrac: Double = 0.10,
      maxDup2Frac: Double = 0.08,
      maxDup3Frac: Double = 0.05,
      sourceThreshold: org.apache.spark.sql.Column = defaultSourceThreshold)
      : DataFrame = {
    // 1. quality gates: the q73 repetition rules are doc-keyed aggs, so
    // compute them once and semi-join the keep set back (ids only)
    val keep = graft.queries.Curation.repetitionStats(docs)
      .filter(col("top_token_frac") <= maxTopTokenFrac &&
        col("dup_2gram_frac") <= maxDup2Frac &&
        col("dup_3gram_frac") <= maxDup3Frac)
      .select("doc_id")
    val gated = docs.join(keep, Seq("doc_id"), "left_semi")

    // 2. PII redaction, then 3. exact dedup on the post-redaction
    // canonical fingerprint. The keep-first reduction runs on an
    // ids-only (fp, doc_id) projection — only fingerprints and ids
    // cross the dedup shuffle — and survivors semi-join back by id, so
    // document text never rides a keyed exchange.
    val redacted = gated
      .withColumn("text", graft.queries.Curation.redactPii(col("text")))
    val fp = md5(graft.functions.TextFunctions.normText(col("text")))
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val survivors = redacted
      .select(col("doc_id"), fp.as("fp"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select("doc_id")
    val deduped = redacted.join(survivors, Seq("doc_id"), "left_semi")

    // 4. per-source budget sampling (q75 rates) + 5. q53 hash split
    val hex = lit("0123456789abcdef")
    val h = md5(concat(lit("mix:"), col("doc_id").cast("string")))
    val b = (instr(hex, substring(h, 1, 1)) - 1) * 16 +
      (instr(hex, substring(h, 2, 1)) - 1)
    val hs = md5(col("text"))
    val bucket = (instr(hex, substring(hs, 1, 1)) - 1) * 16 +
      (instr(hex, substring(hs, 2, 1)) - 1)
    deduped
      .withColumn("__thr", sourceThreshold)
      .filter(b < col("__thr"))
      .withColumn("weight", lit(256.0) / col("__thr"))
      .drop("__thr")
      .withColumn("split",
        when(bucket < 204, "train")
          .when(bucket < 230, "val")
          .otherwise("test"))
  }

  /** Stage 6: the training-ready lake, partitioned (split, source). */
  def write(curated: DataFrame, path: String): Unit =
    curated
      .repartition(col("split"), col("source"))
      .write.mode("overwrite")
      .partitionBy("split", "source")
      .parquet(path)

  /** The full job. */
  def run(docs: DataFrame, path: String): Unit = write(curate(docs), path)
}
