package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t

/** Corpus cleaning beyond per-document filters: exact-substring
  * keep-first dedup with excision-run merging (the Lee et al. 2022
  * "ExactSubstr" shape), and per-source document-frequency boilerplate
  * line removal (the domain-footer / nav-bar class that global
  * count thresholds — q90 — can't separate per site).
  *
  * Both operators shuffle ONLY (id, position, 16-byte md5) rows;
  * document text never crosses an exchange.
  */
object Cleaning extends QueryPack {

  /** Window width (words) for exact-substring dedup. Lee et al. use
    * 50 BPE tokens; 24 words keeps the same "long verbatim overlap"
    * regime at the driver corpus's 10-100-word doc lengths. */
  val SubstrW = 24

  /** 30 fixed words planted as a shared tail paragraph on every 6th
    * doc, so cross-document duplicated windows exist by construction
    * (the corpus is seeded word salad — natural 24-gram collisions
    * are vanishingly rare). One string, used verbatim by both engines. */
  val PlantedPara: String =
    "the quick brown fox jumps over the lazy dog while the spark " +
      "engine shuffles rows across the cluster and the driver " +
      "collects nothing at all tonight"

  // PlantedPara is interpolated into a single-quoted DuckDB literal in the
  // q128 oracle; a quote or backslash would break (or silently change) it.
  require(
    !PlantedPara.exists(c => c == '\'' || c == '\\'),
    "PlantedPara must not contain quote/backslash characters")

  /** documents with the shared paragraph appended on every 6th doc. */
  private def plantedDocs(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      when(col("doc_id") % 6 === 0,
        concat(col("text"), lit(" " + PlantedPara)))
        .otherwise(col("text")).as("text"))

  def defs: Seq[QueryDef] = Seq(
    // ---- Exact-substring corpus dedup, keep-first occurrence ----
    // Every W-word window is fingerprinted (compiled NgramMd5 pass);
    // the FIRST occurrence in (doc_id, position) order survives, every
    // later one is marked for excision; overlapping/adjacent excised
    // windows merge into maximal runs per doc (gaps-and-islands, break
    // when the gap exceeds W). Output is the per-doc excision audit.
    //
    // Scale shape: one exchange of (doc_id, pos, 32-hex) rows keyed by
    // fingerprint for the keep-first window, then doc-keyed windows/
    // aggregates; the join back to doc length is by doc_id. Shuffle
    // volume is ~1 skinny row per corpus word, independent of doc size.
    QueryDef(
      "q128_substring_dedup",
      (s, d) => {
        val w = SubstrW
        val base = plantedDocs(t(s, d, "documents"))
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokens(col("text")).as("tk"))
        val docLen = base.select(
          col("doc_id"), size(col("tk")).cast("long").as("n_words"))
        val wins = base
          .select(col("doc_id"),
            posexplode(graft.functions.HashFunctions.ngramMd5(col("tk"), w)))
          .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("g"))
        val firstWin = Window.partitionBy("g").orderBy("doc_id", "p")
        val flagged = wins
          .withColumn("rn", row_number().over(firstWin))
          .filter(col("rn") > 1)
          .select("doc_id", "p")
        // gaps-and-islands: a new excision run starts when the gap to
        // the previous flagged window exceeds the window width
        val byDoc = Window.partitionBy("doc_id").orderBy("p")
        val runs = flagged
          .withColumn("brk",
            when(col("p") - lag(col("p"), 1, -1000000L).over(byDoc) > w, 1L)
              .otherwise(0L))
          .withColumn("run_id",
            sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("doc_id", "run_id")
          .agg(min(col("p")).as("p0"), max(col("p")).as("p1"),
            count(lit(1)).as("nw"))
          .groupBy("doc_id")
          .agg(
            sum(col("nw")).as("n_dup_windows"),
            count(lit(1)).as("n_runs"),
            sum(col("p1") - col("p0") + w).as("words_excised"))
        docLen
          .join(runs, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            greatest(col("n_words") - (w - 1), lit(0L)).as("n_windows"),
            coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
            coalesce(col("n_runs"), lit(0L)).as("n_runs"),
            coalesce(col("words_excised"), lit(0L)).as("words_excised"),
            col("n_words"),
            ((col("n_words") - coalesce(col("words_excised"), lit(0L)))
              .cast("double") / col("n_words").cast("double"))
              .as("kept_frac"))
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id,
            CASE WHEN doc_id % 6 = 0
              THEN text || ' ' || '$PlantedPara'
              ELSE text END AS text
          FROM documents),
        d AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
          FROM aug),
        wins AS (
          SELECT doc_id, unnest(generate_series(1, greatest(len(tk) - ${SubstrW - 1}, 0))) AS p,
            unnest(list_transform(
              generate_series(1, greatest(len(tk) - ${SubstrW - 1}, 0)),
              i -> md5(array_to_string(tk[i:i+${SubstrW - 1}], ' ')))) AS g
          FROM d),
        flagged AS (
          SELECT doc_id, p FROM (
            SELECT doc_id, p,
              row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
            FROM wins)
          WHERE rn > 1),
        runs AS (
          SELECT doc_id, run_id, MIN(p) AS p0, MAX(p) AS p1,
            COUNT(*) AS nw
          FROM (
            SELECT doc_id, p,
              SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                ROWS UNBOUNDED PRECEDING) AS run_id
            FROM (
              SELECT doc_id, p,
                CASE WHEN p - COALESCE(lag(p) OVER (PARTITION BY doc_id
                  ORDER BY p), -1000000) > $SubstrW
                  THEN 1 ELSE 0 END AS brk
              FROM flagged))
          GROUP BY doc_id, run_id),
        per_doc AS (
          SELECT doc_id,
            CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
            COUNT(*) AS n_runs,
            CAST(SUM(p1 - p0 + $SubstrW) AS BIGINT) AS words_excised
          FROM runs GROUP BY doc_id)
        SELECT d.doc_id,
          greatest(len(d.tk) - ${SubstrW - 1}, 0) AS n_windows,
          COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
          COALESCE(p.n_runs, 0) AS n_runs,
          COALESCE(p.words_excised, 0) AS words_excised,
          CAST(len(d.tk) AS BIGINT) AS n_words,
          CAST(len(d.tk) - COALESCE(p.words_excised, 0) AS DOUBLE)
            / CAST(len(d.tk) AS DOUBLE) AS kept_frac
        FROM d LEFT JOIN per_doc p USING (doc_id)""")),

    // ---- Per-source boilerplate line removal ----
    // A line is boilerplate for a source when it appears in >= 30% of
    // that source's documents (and at least 2) — the per-site footer /
    // nav-bar class. Planted: a sitewide nav line on every 4th doc and
    // a per-source copyright footer on 2 of every 3 docs, so the
    // per-source DF threshold is load-bearing (the footer text differs
    // per source, so a GLOBAL threshold would mis-rank it).
    //
    // Scale shape: line instances collapse to distinct
    // (source, doc_id, fp) before the (source, fp) document-frequency
    // aggregate — both combinable; the boilerplate set is tiny and
    // joins back to instance counts by (source, fp). Text stays in
    // per-row expressions.
    QueryDef(
      "q129_source_boilerplate",
      (s, d) => {
        val aug = t(s, d, "documents").select(
          col("doc_id"), col("source"),
          concat(
            when(col("doc_id") % 4 === 0,
              lit("home about contact sitemap login\n")).otherwise(lit("")),
            col("text"),
            when(col("doc_id") % 3 =!= 2,
              concat(lit("\ncopyright "), col("source"),
                lit(" all rights reserved"))).otherwise(lit("")))
            .as("t"))
        val inst = aug
          .select(col("source"), col("doc_id"),
            explode(split(col("t"), "\n")).as("line"))
          .select(col("source"), col("doc_id"), md5(col("line")).as("fp"))
        val docLine = inst.distinct()
        val srcDocs = aug.groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
        val boiler = docLine
          .groupBy("source", "fp")
          .agg(count(lit(1)).as("df"))
          .join(srcDocs, "source")
          .filter(col("df") >= 2 && col("df") * 10 >= col("n_docs") * 3)
          .select("source", "fp", "df")
        val removed = inst.join(boiler, Seq("source", "fp"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_occurrences_removed"),
            countDistinct(col("doc_id")).as("n_docs_affected"))
        val nb = boiler.groupBy("source")
          .agg(count(lit(1)).as("n_boiler_lines"))
        val totals = inst.groupBy("source")
          .agg(count(lit(1)).as("n_lines_total"))
        totals
          .join(nb, Seq("source"), "left")
          .join(removed, Seq("source"), "left")
          .select(
            col("source"),
            col("n_lines_total"),
            coalesce(col("n_boiler_lines"), lit(0L)).as("n_boiler_lines"),
            coalesce(col("n_occurrences_removed"), lit(0L))
              .as("n_occurrences_removed"),
            coalesce(col("n_docs_affected"), lit(0L)).as("n_docs_affected"),
            (col("n_lines_total") -
              coalesce(col("n_occurrences_removed"), lit(0L)))
              .as("n_lines_kept"))
      },
      Some("""
        WITH aug AS (
          SELECT doc_id, source,
            CASE WHEN doc_id % 4 = 0
              THEN 'home about contact sitemap login' || chr(10)
              ELSE '' END
            || text
            || CASE WHEN doc_id % 3 <> 2
              THEN chr(10) || 'copyright ' || source
                || ' all rights reserved'
              ELSE '' END AS t
          FROM documents),
        inst AS (
          SELECT source, doc_id, md5(unnest(string_split(t, chr(10)))) AS fp
          FROM aug),
        doc_line AS (SELECT DISTINCT source, doc_id, fp FROM inst),
        src_docs AS (SELECT source, COUNT(*) AS n_docs FROM aug GROUP BY source),
        boiler AS (
          SELECT dl.source, dl.fp, COUNT(*) AS df
          FROM doc_line dl
          GROUP BY dl.source, dl.fp),
        boiler_f AS (
          SELECT b.source, b.fp FROM boiler b JOIN src_docs s USING (source)
          WHERE b.df >= 2 AND b.df * 10 >= s.n_docs * 3),
        removed AS (
          SELECT i.source,
            COUNT(*) AS n_occurrences_removed,
            COUNT(DISTINCT i.doc_id) AS n_docs_affected
          FROM inst i JOIN boiler_f b ON i.source = b.source AND i.fp = b.fp
          GROUP BY i.source),
        nb AS (
          SELECT source, COUNT(*) AS n_boiler_lines FROM boiler_f
          GROUP BY source),
        totals AS (
          SELECT source, COUNT(*) AS n_lines_total FROM inst GROUP BY source)
        SELECT t.source, t.n_lines_total,
          COALESCE(nb.n_boiler_lines, 0) AS n_boiler_lines,
          COALESCE(r.n_occurrences_removed, 0) AS n_occurrences_removed,
          COALESCE(r.n_docs_affected, 0) AS n_docs_affected,
          t.n_lines_total - COALESCE(r.n_occurrences_removed, 0)
            AS n_lines_kept
        FROM totals t
        LEFT JOIN nb USING (source)
        LEFT JOIN removed r USING (source)""")),

    // ---- q279: Unicode NFC normalization audit — un-normalized text
    //      is a silent dedup leak ("é" precomposed vs "e"+COMBINING
    //      ACUTE are different bytes, identical glyphs: exact/MinHash
    //      fingerprints miss the pair and tokenizers split them
    //      apart). The corpus is deterministically "dirtied" in-query
    //      (every 'e' decomposed to e+U+0301 on doc_id%3==0 rows —
    //      the synthetic stand-in for crawl-source mojibake), then
    //      normalized by the new codegen'd [[graft.functions
    //      .NfcNormalize]] Catalyst expression; DuckDB's ICU
    //      `nfc_normalize` is the oracle, so hash equality checks the
    //      JDK normalizer against an independent UAX #15
    //      implementation. Per-source: docs changed, chars before /
    //      after, combining marks removed. Pure per-row map — no
    //      shuffle but the final count. ----
    QueryDef(
      "q279_nfc_normalize",
      (s, d) => {
        val dirty = when(col("doc_id") % 3 === 0,
          regexp_replace(col("text"), "e", "e\u0301"))
          .otherwise(col("text"))
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), dirty.as("aug"))
          .withColumn("norm",
            graft.functions.UnicodeFunctions.nfcNormalize(col("aug")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("aug") =!= col("norm"), 1L).otherwise(0L))
              .as("n_changed"),
            sum(length(col("aug"))).as("chars_before"),
            sum(length(col("norm"))).as("chars_after"))
          .withColumn("marks_removed",
            col("chars_before") - col("chars_after"))
      },
      Some("""
        WITH aug AS (
          SELECT source, doc_id,
            CASE WHEN doc_id % 3 = 0
              THEN replace(text, 'e', 'e' || chr(769))
              ELSE text END AS aug
          FROM documents),
        norm AS (
          SELECT source, aug, nfc_normalize(aug) AS norm FROM aug)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN aug <> norm THEN 1 ELSE 0 END) AS BIGINT)
            AS n_changed,
          CAST(SUM(length(aug)) AS BIGINT) AS chars_before,
          CAST(SUM(length(norm)) AS BIGINT) AS chars_after,
          CAST(SUM(length(aug)) - SUM(length(norm)) AS BIGINT)
            AS marks_removed
        FROM norm GROUP BY 1""")),

    // ---- q289: quantile normalization — align every source's
    //      doc-length distribution onto the POOLED distribution by
    //      rank (the batch-effect removal of bioinformatics, applied
    //      to per-crawl score/length drift): a row at within-source
    //      rank r maps to the pooled disc-quantile at relative
    //      position ceil(r·N/n_s). Element-picking keeps everything
    //      int64. The pooled CDF collapses to ≤ |value domain| rows
    //      (n_chars spans a few hundred values — a DOMAIN bound, not
    //      a data bound), collected and broadcast as two literal
    //      arrays; the per-row lookup is element_at(vals,
    //      #\{cum < k\} + 1) — an O(levels) codegen'd HOF, no join.
    //      Output: per-source adjustment audit. ----
    QueryDef(
      "q289_quantile_normalize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val rows = t(s, d, "documents")
          .select(col("source"), col("doc_id"),
            col("n_chars").cast("long").as("x"))
        val nTot = rows.count()
        val levels = rows.groupBy("x").agg(count(lit(1)).as("c"))
          .orderBy("x").collect()
        val vals = levels.map(_.getLong(0)).toSeq
        val cums = vals.indices
          .map(i => levels.take(i + 1).map(_.getLong(1)).sum)
        val w = Window.partitionBy("source")
          .orderBy(col("x"), col("doc_id"))
        val ns = rows.groupBy("source").agg(count(lit(1)).as("n_s"))
        rows.withColumn("r", row_number().over(w).cast("long"))
          .join(broadcast(ns), Seq("source"))
          .withColumn("k", expr(s"(r * $nTot + n_s - 1) div n_s"))
          .withColumn("q", element_at(typedLit(vals),
            (size(filter(typedLit(cums), c => c < col("k"))) + 1)))
          .groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum(abs(col("x") - col("q"))).as("total_shift"),
            max(abs(col("x") - col("q"))).as("max_shift"),
            sum(when(col("x") === col("q"), 1L).otherwise(0L))
              .as("n_unchanged"))
      },
      Some("""
        WITH rows_ AS (
          SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x
          FROM documents),
        tot AS (SELECT COUNT(*) AS N FROM rows_),
        ns AS (SELECT source, COUNT(*) AS n_s FROM rows_ GROUP BY 1),
        rk AS (
          SELECT source, doc_id, x,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY x, doc_id) AS BIGINT) AS r
          FROM rows_),
        kk AS (
          SELECT rk.source, x, (r * N + n_s - 1) // n_s AS k
          FROM rk JOIN ns ON rk.source = ns.source, tot),
        lv AS (SELECT x AS v, COUNT(*) AS c FROM rows_ GROUP BY 1),
        cdf AS (
          SELECT v,
            CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum,
            CAST(COALESCE(SUM(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumprev
          FROM lv),
        qn AS (
          SELECT kk.source, kk.x, cdf.v AS q
          FROM kk JOIN cdf ON kk.k > cdf.cumprev AND kk.k <= cdf.cum)
        SELECT source, COUNT(*) AS n,
          CAST(SUM(abs(x - q)) AS BIGINT) AS total_shift,
          CAST(MAX(abs(x - q)) AS BIGINT) AS max_shift,
          CAST(SUM(CASE WHEN x = q THEN 1 ELSE 0 END) AS BIGINT)
            AS n_unchanged
        FROM qn GROUP BY 1""")),
  )
}
