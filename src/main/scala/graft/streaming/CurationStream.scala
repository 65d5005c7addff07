package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming corpus-ingest pipeline: the LLM training-data curation
  * operators (SURVEY §7.5) composed into the Structured Streaming
  * spine — the shape a CONTINUOUS corpus ingest runs at 100 TB, where
  * the corpus arrives as a stream of documents rather than a static
  * lake (the same source/sink/checkpoint contract as the alert spine,
  * ref fink_broker/common/spark_utils.py:225-308 for the front door).
  *
  * Scale design: the quality gates and redaction are pure per-row
  * expressions — map-only inside each micro-batch, zero shuffles, all
  * codegen'd — and run FIRST so a rejected document never pays state;
  * the exact dedup is the watermark-bounded stateful operator
  * ([[Stateful.streamingDedup]]), whose state carries one 32-hex
  * fingerprint per kept document, not document text.
  */
object CurationStream {

  /** Per-row curation: quality-gate → PII-redact → fingerprint.
    * Gates are the q17/q73 ratio cuts; redaction is the q74 operator;
    * the fingerprint is q19's whitespace-normalized md5 canonical form
    * (computed AFTER redaction so re-crawls differing only in masked
    * spans dedup together).
    */
  def curate(
      docs: DataFrame,
      minTokens: Int = 5,
      minAlphaRatio: Double = 0.5): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      // fused one-pass alpha counter (r14): the regexp_replace form
      // re-built the whole document per row just to count its letters;
      // value equality is pinned by UnicodeSpec
      .withColumn("alpha_ratio",
        graft.functions.UnicodeFunctions.alphaCount(col("text"))
          .cast("double") / length(col("text")))
      .filter(col("n_tokens") >= minTokens &&
        col("alpha_ratio") >= minAlphaRatio)
      .withColumn("text", graft.queries.Curation.redactPii(col("text")))
      .withColumn("fp",
        md5(graft.functions.TextFunctions.normText(col("text"))))
  }

  /** The full stream: curate → content-fingerprint exact dedup. Pass
    * `withinWatermark = Some((ingestTimeCol, delay))` on unbounded
    * streams so fingerprint state expires (the 100 TB form — upstream
    * re-crawl windows are finite); None keeps global state for bounded
    * backfills.
    */
  def pipeline(
      stream: DataFrame,
      withinWatermark: Option[(String, String)] = None): DataFrame =
    Stateful.streamingDedup(curate(stream), Seq("fp"), withinWatermark)
}
