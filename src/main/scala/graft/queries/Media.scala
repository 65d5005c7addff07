package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t
import graft.multimodal.Multimodal

/** Multimodal codec queries with HONEST DuckDB oracles: the payloads
  * are synthesized deterministically from `documents.text` (pure
  * printable ASCII in every vintage), so the oracle can compute the
  * expected post-decode statistics directly from the text while the
  * Spark side routes the SAME bytes through the REAL codecs
  * (ImageIO PNG, RIFF/PCM16 WAV). Hash equality is then a corpus-wide
  * proof that encode→decode is the identity on executor JVMs — the
  * missing end-to-end evidence for the multimodal stack beyond
  * single-fixture golden tests.
  *
  * Scale shape: both queries are embarrassingly parallel per-row
  * kernels (no shuffle at all until the final tiny aggregate); the
  * decode stage is exactly the [[Multimodal.withDecodeParallelism]]
  * profile — repartition first, decode inside the partition.
  */
object Media extends QueryPack {

  /** First 48 ASCII codes of the doc's text, space-padded: the
    * deterministic payload seed shared by both queries. Padding
    * matters — sf0.1 has documents shorter than 48 chars, and DuckDB's
    * `ord('')` is -1, so an unpadded seed diverges (and under-fills
    * the 4x4 image) on short docs.
    */
  private val seedLen = 48

  def defs: Seq[QueryDef] = Seq(
    // ---- q158: PNG round trip through the REAL ImageIO codec ----
    // text[0:48] bytes → 4x4 RGB image → encodePng → decodeImageIO →
    // pixel statistics. PNG is lossless, so the oracle's direct
    // text-byte statistics must hash-match exactly — if the codec,
    // the BGR ordering, the row layout, or the byte/int sign handling
    // were wrong anywhere, every row would diverge.
    QueryDef(
      "q158_png_roundtrip",
      (s, d) => {
        val pngStats = udf { text: String =>
          val bytes = (text + " " * seedLen).take(seedLen).getBytes("US-ASCII")
          val png = Multimodal.encodePng(4, 4, bytes)
          Multimodal.decodeImageIO(png) match {
            case Some(("png", 4, 4, rgb)) =>
              (rgb.map(_ & 0xff).map(_.toLong).sum,
                rgb.count(b => (b & 0xff) > 109).toLong)
            case _ => (-1L, -1L)
          }
        }
        t(s, d, "documents")
          .select(col("doc_id"), pngStats(col("text")).as("st"))
          .select(col("doc_id"),
            col("st._1").as("pixel_sum"),
            col("st._2").as("n_gt_m"))
      },
      Some(s"""
        WITH ch AS (
          SELECT doc_id,
            list_transform(
              generate_series(1, $seedLen),
              i -> ord(substring(rpad(text, $seedLen, ' '),
                CAST(i AS INT), 1))) AS codes
          FROM documents)
        SELECT doc_id,
          CAST(list_sum(codes) AS BIGINT) AS pixel_sum,
          CAST(len(list_filter(codes, c -> c > 109)) AS BIGINT) AS n_gt_m
        FROM ch""")),

    // ---- q159: WAV round trip through the RIFF/PCM16 codec ----
    // text[0:48] codes → centered PCM16 samples (code*256 - 16384) →
    // encodeWav → decodeWav → sample statistics. decodeWav is exact,
    // so the oracle computes the same stats straight from the text.
    QueryDef(
      "q159_wav_roundtrip",
      (s, d) => {
        val wavStats = udf { text: String =>
          val samples = (text + " " * seedLen).take(seedLen).getBytes("US-ASCII")
            .map(b => ((b & 0xff) * 256 - 16384).toShort)
          val wav = Multimodal.encodeWav(8000, 1, samples)
          Multimodal.decodeWav(wav) match {
            case Some((8000, 1, got)) =>
              (got.map(_.toLong).sum, got.map(_.toLong).max,
                got.map(_.toLong).min)
            case _ => (-1L, -1L, -1L)
          }
        }
        t(s, d, "documents")
          .select(col("doc_id"), wavStats(col("text")).as("st"))
          .select(col("doc_id"),
            col("st._1").as("sample_sum"),
            col("st._2").as("sample_max"),
            col("st._3").as("sample_min"))
      },
      Some(s"""
        WITH ch AS (
          SELECT doc_id,
            list_transform(
              generate_series(1, $seedLen),
              i -> ord(substring(rpad(text, $seedLen, ' '),
                CAST(i AS INT), 1)) * 256 - 16384)
              AS samples
          FROM documents)
        SELECT doc_id,
          CAST(list_sum(samples) AS BIGINT) AS sample_sum,
          CAST(list_max(samples) AS BIGINT) AS sample_max,
          CAST(list_min(samples) AS BIGINT) AS sample_min
        FROM ch""")),
  )
}
