package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack, Tables}
import graft.core.Tables.t
import graft.functions.TextFunctions._

/** LLM-pipeline text analysis over the `documents` table (SURVEY §7.5):
  * token counting, quality scoring, document fingerprinting, language ID.
  *
  * All metrics are expression-only (no UDFs) so they run inside Catalyst;
  * ratio features divide identical integer operands in both engines, so
  * DuckDB oracle hashes match bit-for-bit.
  */
object TextAnalysis extends QueryPack {

  /** RAKE phrase segmentation as ONE per-row regex pass (q301's
    * kernel, shared with its parity test so the proven-equivalent
    * shape and production can never drift apart): whole
    * whitespace-delimited stopword tokens become a NUL phrase
    * delimiter (lookaround keeps the spaces, so consecutive stopwords
    * still split; NUL cannot occur in whitespace-split tokens the way
    * a printable delimiter could, and each stopword is Pattern-quoted
    * so a future stop list can't inject regex metachars), then
    * phrases explode with their length in hand. Returns (plen, tok)
    * rows — one per non-stop token occurrence. Empty/whitespace-only
    * documents emit NOTHING (the x =!= "" / size > 0 filters): an
    * empty doc has no keywords — where a naive \s+ split of "" would
    * synthesize a single "" token. q301's oracle pins the same
    * semantics (tok <> ''); the Round11Spec parity fixture covers it.
    * Versus the windowed
    * run-id formulation this removes the doc-keyed sort AND the
    * (doc, run) join-back; the caller's groupBy(tok) is the only
    * shuffle. */
  private[graft] def rakeTokPlen(
      docs: org.apache.spark.sql.DataFrame,
      stops: Seq[String]): org.apache.spark.sql.DataFrame = {
    val pat = "(?<=\\s)(?:" +
      stops.map(java.util.regex.Pattern.quote).mkString("|") + ")(?=\\s)"
    docs
      .select(explode(split(
        regexp_replace(
          concat(lit(" "), trim(lower(col("text"))), lit(" ")),
          pat, "\u0000"),
        "\u0000")).as("seg"))
      .select(filter(split(trim(col("seg")), "\\s+"),
        x => x =!= "").as("ptoks"))
      .filter(size(col("ptoks")) > 0)
      .select(size(col("ptoks")).as("plen"),
        explode(col("ptoks")).as("tok"))
  }

  def defs: Seq[QueryDef] = Seq(
    // ---- Token counting (whitespace tokenizer) ----
    QueryDef(
      "q16_token_count",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("len_chars")),
      Some("""
        SELECT doc_id,
          len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
          length(text) AS len_chars
        FROM documents""")),

    // ---- Token counting (BPE-ish regex tokenizer) ----
    // GPT-2-style pretokenization minus the lookaheads (RE2 has none,
    // so the pattern is portable to any engine): contraction suffixes,
    // letter runs, SINGLE digits (number fan-out like real BPE vocab),
    // punctuation runs. The per-doc BPE-ish count vs the whitespace
    // count (q16) is the standard tokens-per-word budget estimate.
    QueryDef(
      "q60_bpe_tokens",
      (s, d) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
        t(s, d, "documents")
          .withColumn("bpe",
            regexp_extract_all(col("text"), lit(pat), lit(0)))
          .select(
            col("doc_id"),
            size(col("bpe")).cast("long").as("n_bpe"),
            size(array_distinct(col("bpe"))).cast("long").as("n_bpe_distinct"),
            size(tokens(col("text"))).cast("long").as("n_ws"))
      },
      Some("""
        SELECT doc_id,
          len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe,
          len(list_distinct(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))
            AS n_bpe_distinct,
          len(regexp_split_to_array(trim(text), '\s+')) AS n_ws
        FROM documents""")),

    // ---- Quality scoring: C4/Gopher-style ratio features ----
    QueryDef(
      "q17_quality_score",
      (s, d) =>
        t(s, d, "documents")
          .withColumn("q", qualityMetrics(col("text")))
          .select(
            col("doc_id"),
            col("q.n_tokens").as("n_tokens"),
            col("q.chars_per_token").as("chars_per_token"),
            col("q.alpha_ratio").as("alpha_ratio"),
            col("q.space_ratio").as("space_ratio"),
            col("q.stopword_ratio").as("stopword_ratio")),
      Some("""
        WITH d AS (
          SELECT doc_id, text,
            regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents)
        SELECT doc_id,
          len(toks) AS n_tokens,
          length(text)::DOUBLE / len(toks) AS chars_per_token,
          length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
            / length(text) AS alpha_ratio,
          (length(text) - length(regexp_replace(text, '\s', '', 'g')))::DOUBLE
            / length(text) AS space_ratio,
          len(list_intersect(list_distinct(toks),
            ['the','and','of','to','in','is','that','it','was','for']))::DOUBLE
            / len(list_distinct(toks)) AS stopword_ratio
        FROM d""")),

    // ---- Document fingerprint: md5 of whitespace-normalized text (the
    //      SQL-expressible canonical-form fingerprint; the 64-bit
    //      rolling-hash variant lives in TextFunctions.simhash64 and is
    //      exercised by q23) ----
    QueryDef(
      "q19_fingerprint",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            md5(normText(col("text"))).as("fp")),
      Some("""
        SELECT doc_id,
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents""")),

    // ---- Language ID heuristic (marker-word overlap), oracle-exact:
    //      the argmax over per-language marker overlaps is pure
    //      list_intersect SQL, so the DuckDB oracle is GENERATED from
    //      the same langMarkers map the Spark expression uses (ties and
    //      zero overlap -> 'und', first-language-wins tie order in both).
    //      TextAnalysisSpec additionally pins real-language fixtures. ----
    QueryDef(
      "q18_lang_id",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            col("lang").as("labeled_lang"),
            langId(col("text")).as("detected_lang")),
      Some(langIdOracle)),

    // ---- Character-distribution entropy — the cheap "is this text or
    //      noise" quality gate (repetitive spam / template boilerplate
    //      scores near 0 bits, natural language ≈ 3–4): per-doc letter
    //      histogram → the q102 integer-log2 surrogate
    //      H = Σ n_c · (⌊log2 N⌋ − ⌊log2 n_c⌋), exact bigints in both
    //      engines (no float log anywhere). The 26 per-letter counts
    //      come from length-minus-replace over the lowered text — 26
    //      codegen'd passes, map-only off a parallel scan (the only
    //      exchange is the conditional InputSpread, a no-op whenever
    //      the scan itself is parallel — plan-asserted); a single-pass
    //      fused histogram Expression is the obvious upgrade if this
    //      ever dominates a profile, but the operator's scale story
    //      (pure per-row, linear scan) is already the right one. ----
    QueryDef(
      "q114_char_entropy",
      (s, d) => {
        // fused single-pass histogram (r14): the previous form was 26
        // length-minus-replace expressions — 26 full string scans AND
        // 26 string re-builds per row. AsciiLetterHistogram counts all
        // 26 letters in one byte pass with zero allocation beyond the
        // output array; byte counts equal the code-point counts the
        // replace form produced because ASCII bytes never occur inside
        // a multi-byte UTF-8 sequence (kernel scaladoc has the proof;
        // UnicodeSpec pins equality against the replace form).
        val cnts = graft.functions.UnicodeFunctions
          .letterHistogram(col("lt"))
        val bits = (c: org.apache.spark.sql.Column) =>
          (length(bin(c)) - 1).cast("long")
        graft.operators.InputSpread.byKey(
          t(s, d, "documents")
            .select(col("doc_id"), col("source"), col("text")),
          col("doc_id"))
          .select(col("doc_id"), col("source"),
            lower(col("text")).as("lt"))
          .select(col("doc_id"), col("source"), cnts.as("cnts"))
          .select(col("doc_id"), col("source"), col("cnts"),
            aggregate(col("cnts"), lit(0L), (a, v) => a + v)
              .as("n_letters"))
          .filter(col("n_letters") > 0)
          .select(col("doc_id"), col("source"), col("n_letters"),
            aggregate(
              transform(col("cnts"), c =>
                when(c > 0, c * (bits(col("n_letters")) - bits(c)))
                  .otherwise(lit(0L))),
              lit(0L), (a, v) => a + v).as("h_bits"))
          .select(col("doc_id"), col("source"), col("n_letters"),
            col("h_bits"),
            expr("h_bits * 1000 div n_letters").as("mean_millibits"),
            when(expr("h_bits * 1000 div n_letters") < 1500, 1L)
              .otherwise(0L).as("low_entropy"))
      },
      Some {
        val arr = ('a' to 'z')
          .map(c => s"length(lt) - length(replace(lt, '$c', ''))")
          .mkString("[", ",\n            ", "]")
        s"""
        WITH base AS (
          SELECT doc_id, source, lower(text) AS lt FROM documents),
        cn AS (
          SELECT doc_id, source, $arr AS cnts
          FROM base),
        n AS (
          SELECT doc_id, source, cnts,
            CAST(list_sum(cnts) AS BIGINT) AS n_letters
          FROM cn WHERE CAST(list_sum(cnts) AS BIGINT) > 0),
        h AS (
          SELECT doc_id, source, n_letters,
            CAST(list_sum(list_transform(cnts, c -> CASE WHEN c > 0
              THEN c * ((length(bin(n_letters)) - 1)
                - (length(bin(c)) - 1))
              ELSE 0 END)) AS BIGINT) AS h_bits
          FROM n)
        SELECT doc_id, source, n_letters, h_bits,
          (h_bits * 1000) // n_letters AS mean_millibits,
          CAST(CASE WHEN (h_bits * 1000) // n_letters < 1500
            THEN 1 ELSE 0 END AS BIGINT) AS low_entropy
        FROM h"""
      }),

    // ---- q138: inverted-index build — the retrieval-serving layout op
    //      (term dictionary + posting lists). One explode to (doc, term)
    //      then a (term, doc)-keyed tf count; the term dictionary (df,
    //      cf) and the posting-list HEAD (first 8 doc ids as "id:tf",
    //      comma-joined) come from term-keyed aggregates. The head cut
    //      is a term-partitioned row_number <= 8 BEFORE any collect, so
    //      no per-term list is ever df-sized — a stopword's full
    //      posting list never materializes on one task. df >= 5 keeps
    //      the emitted dictionary to the load-bearing vocabulary (the
    //      long tail stays in the tf table). At 100 TB the posting-list
    //      BODY shards by (term, doc-range) with this same plan; the
    //      bounded head is what a dictionary / impact-ordered index
    //      stores inline. ----
    QueryDef(
      "q138_inverted_index",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = t(s, d, "documents")
          .select(col("doc_id"),
            explode(tokens(lower(col("text")))).as("term"))
          .groupBy("term", "doc_id")
          .agg(count(lit(1)).as("tf"))
        val stats = tf.groupBy("term")
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
          .filter(col("df") >= 5)
        val w = Window.partitionBy("term").orderBy("doc_id")
        val head = tf
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 8)
          .groupBy("term")
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("doc_id"), col("tf")))),
            x => concat(x.getField("doc_id").cast("string"), lit(":"),
              x.getField("tf").cast("string"))), ",").as("postings_head"))
        stats.join(head, Seq("term"))
          .select(col("term"), col("df"), col("cf"), col("postings_head"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM documents),
        tf AS (
          SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        stats AS (
          SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
          FROM tf GROUP BY 1 HAVING COUNT(*) >= 5),
        head AS (
          SELECT term,
            string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
              AS postings_head
          FROM (SELECT term, doc_id, tf,
              row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
            FROM tf)
          WHERE rn <= 8 GROUP BY term)
        SELECT s.term, s.df, s.cf, h.postings_head
        FROM stats s JOIN head h USING (term)""")),

    // ---- q149: INCREMENTAL index maintenance — the operation a
    //      serving index needs nightly: fold a new crawl batch's
    //      postings into the standing dictionary without re-reading
    //      the base corpus. Base (doc_id < 1500) and delta (>= 1500)
    //      partition the doc space, so per-term df/cf ADD exactly.
    //      The oracle is deliberately asymmetric: Spark computes the
    //      INCREMENTAL merge (base stats + delta stats), DuckDB
    //      REBUILDS the dictionary from the full corpus — the
    //      hash-exact compare IS the proof that the maintenance
    //      algebra equals a rebuild. Scale: the delta pass touches
    //      only new docs; the merge is a term-keyed outer join of two
    //      dictionary tables (vocabulary-bounded), never a corpus
    //      re-scan. ----
    QueryDef(
      "q149_index_maintenance",
      (s, d) => {
        val stats = (docs: org.apache.spark.sql.DataFrame) =>
          docs.select(col("doc_id"),
            explode(tokens(lower(col("text")))).as("term"))
            .groupBy("term", "doc_id")
            .agg(count(lit(1)).as("tf"))
            .groupBy("term")
            .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
        val all = t(s, d, "documents")
        val base = stats(all.filter(col("doc_id") < 1500))
          .select(col("term"), col("df").as("df_base"),
            col("cf").as("cf_base"))
        val delta = stats(all.filter(col("doc_id") >= 1500))
          .select(col("term"), col("df").as("df_delta"),
            col("cf").as("cf_delta"))
        base.join(delta, Seq("term"), "full_outer")
          .select(col("term"),
            coalesce(col("df_base"), lit(0L)).as("df_base"),
            coalesce(col("df_delta"), lit(0L)).as("df_delta"),
            (coalesce(col("df_base"), lit(0L)) +
              coalesce(col("df_delta"), lit(0L))).as("df_merged"),
            (coalesce(col("cf_base"), lit(0L)) +
              coalesce(col("cf_delta"), lit(0L))).as("cf_merged"))
          .filter(col("df_merged") >= 5)
      },
      Some("""
        WITH tok AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM documents),
        tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        -- the REBUILD side: full-corpus dictionary, never the merge
        full_d AS (
          SELECT term, COUNT(*) AS df_merged,
            CAST(SUM(tf) AS BIGINT) AS cf_merged
          FROM tf GROUP BY 1),
        base_d AS (
          SELECT term, COUNT(*) AS df_base FROM tf
          WHERE doc_id < 1500 GROUP BY 1),
        delta_d AS (
          SELECT term, COUNT(*) AS df_delta FROM tf
          WHERE doc_id >= 1500 GROUP BY 1)
        SELECT f.term,
          COALESCE(b.df_base, 0) AS df_base,
          COALESCE(dl.df_delta, 0) AS df_delta,
          f.df_merged, f.cf_merged
        FROM full_d f
        LEFT JOIN base_d b USING (term)
        LEFT JOIN delta_d dl USING (term)
        WHERE f.df_merged >= 5""")),

    // ---- q154: distinctive-term extraction (chi-squared-style) ----
    // Which terms are OVER-represented in each source vs the corpus?
    // The signed association numerator c_st*N - n_s*n_t (the chi-
    // squared / G-test numerator before normalization) ranks terms
    // with pure int64 arithmetic — no log/sqrt to diverge across
    // engines. Top-5 per source, ties broken by term. The corpus-
    // curation use: per-site vocabulary drift / topical fingerprint.
    //
    // Scale shape: one (source, term) count pass (map-side combined),
    // term totals and source totals are vocabulary- and source-bounded
    // broadcasts, the window is partitioned by source. Magnitudes:
    // c_st*N <= 1e10 at sf0.1, orders below int64 range; at 100 TB
    // the same statistic runs on per-shard counts summed in the same
    // int64 discipline (N ~ 1e13, c_st*N bounded by 1e18 — still in
    // range for single-term counts; beyond that, scale both factors
    // down by a common power of two first).
    QueryDef(
      "q154_distinctive_terms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = t(s, d, "documents")
          .select(col("source"),
            explode(tokens(lower(col("text")))).as("term"))
        val st = tok.groupBy("source", "term")
          .agg(count(lit(1)).as("c_st"))
        val srcTot = st.groupBy("source").agg(sum("c_st").as("n_s"))
        val termTot = st.groupBy("term").agg(sum("c_st").as("n_t"))
        val totN = st.agg(sum("c_st").as("n")).select(col("n"))
        val w = Window.partitionBy("source")
          .orderBy(col("lift_num").desc, col("term"))
        st.join(broadcast(srcTot), "source")
          .join(termTot, "term")
          .crossJoin(broadcast(totN))
          .filter(col("c_st") >= 10)
          .withColumn("lift_num",
            col("c_st") * col("n") - col("n_s") * col("n_t"))
          .filter(col("lift_num") > 0)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("source", "rank", "term", "c_st", "n_s", "n_t",
            "lift_num")
      },
      Some("""
        WITH tok AS (
          SELECT source,
            unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM documents),
        st AS (
          SELECT source, term, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
        tot AS (
          SELECT source, term, c_st,
            CAST(SUM(c_st) OVER (PARTITION BY source) AS BIGINT) AS n_s,
            CAST(SUM(c_st) OVER (PARTITION BY term) AS BIGINT) AS n_t,
            CAST(SUM(c_st) OVER () AS BIGINT) AS n
          FROM st),
        scored AS (
          SELECT source, term, c_st, n_s, n_t,
            c_st * n - n_s * n_t AS lift_num
          FROM tot WHERE c_st >= 10 AND c_st * n - n_s * n_t > 0),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY lift_num DESC, term) AS rank
          FROM scored)
        SELECT source, rank, term, c_st, n_s, n_t, lift_num
        FROM ranked WHERE rank <= 5""")),

    // ---- q155: pointwise mutual information over adjacent bigrams ----
    // Collocation mining with EXACT integer output: for every bigram
    // with c_ab >= 20, PMI = log(c_ab·N1² / (N2·c_a·c_b)) is reported
    // as its integer numerator/denominator pair plus the bit-length
    // log2 proxy (the q124 Zipf discipline) — no transcendental
    // function crosses the engine boundary. Positive-PMI filter keeps
    // genuine collocations.
    //
    // Scale shape: the bigram explode is one corpus pass; unigram and
    // bigram count tables are vocabulary-bounded; the two unigram
    // joins key on the bigram's own words. Magnitudes at sf0.1:
    // N1² ~ 1e12, c_ab·N1² <= ~1e16 < 2^63. At larger N, divide both
    // sides by gcd-free common powers (or report the log2 proxy only,
    // which needs just bit lengths of the factors).
    QueryDef(
      "q155_pmi_bigrams",
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"), tokens(lower(col("text"))).as("tk"))
        val uni = tk.select(explode(col("tk")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val n1 = uni.agg(sum("c").as("n1"))
        val bi = tk
          .select(explode(arrays_zip(
            slice(col("tk"), lit(1), size(col("tk")) - 1),
            slice(col("tk"), lit(2), size(col("tk")) - 1))).as("p"))
          .select(col("p.0").as("a"), col("p.1").as("b"))
        val n2 = bi.agg(count(lit(1)).as("n2"))
        val ab = bi.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 20)
        ab
          .join(uni.select(col("w").as("a"), col("c").as("c_a")), Seq("a"))
          .join(uni.select(col("w").as("b"), col("c").as("c_b")), Seq("b"))
          .crossJoin(broadcast(n1))
          .crossJoin(broadcast(n2))
          .withColumn("pmi_num", col("c_ab") * col("n1") * col("n1"))
          .withColumn("pmi_den", col("n2") * col("c_a") * col("c_b"))
          .filter(col("pmi_num") > col("pmi_den"))
          .withColumn("log2_pmi",
            (length(bin(col("pmi_num"))) - length(bin(col("pmi_den"))))
              .cast("long"))
          .select("a", "b", "c_ab", "c_a", "c_b", "pmi_num", "pmi_den",
            "log2_pmi")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        uni AS (
          SELECT unnest(tk) AS w FROM tk),
        uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
        n1t AS (SELECT CAST(SUM(c) AS BIGINT) AS n1 FROM uc),
        bi AS (
          SELECT unnest(list_transform(
              generate_series(1, len(tk) - 1), i -> tk[i])) AS a,
            unnest(list_transform(
              generate_series(1, len(tk) - 1), i -> tk[i + 1])) AS b
          FROM tk),
        n2t AS (SELECT COUNT(*) AS n2 FROM bi),
        ab AS (
          SELECT a, b, COUNT(*) AS c_ab FROM bi GROUP BY 1, 2
          HAVING COUNT(*) >= 20)
        SELECT ab.a, ab.b, ab.c_ab, ca.c AS c_a, cb.c AS c_b,
          ab.c_ab * n1 * n1 AS pmi_num,
          n2 * ca.c * cb.c AS pmi_den,
          CAST(length(bin(ab.c_ab * n1 * n1))
            - length(bin(n2 * ca.c * cb.c)) AS BIGINT) AS log2_pmi
        FROM ab
        JOIN uc ca ON ab.a = ca.w
        JOIN uc cb ON ab.b = cb.w
        CROSS JOIN n1t CROSS JOIN n2t
        WHERE ab.c_ab * n1 * n1 > n2 * ca.c * cb.c""")),

    // ---- q157: sparse cosine top-k via the inverted index ----
    // Nearest neighbors by SHARED RARE FEATURES: 3-gram shingle tf
    // vectors joined on their posting lists (2 <= df <= 50 prunes the
    // boilerplate shingles, the standard impact-ordered-index trick),
    // integer dot product, top-3 neighbors per doc by (dot DESC,
    // doc_b).
    // The integer dot ranks like cosine when doc lengths are
    // comparable and keeps the oracle hash-exact; the full cosine
    // variant (dense embeddings) is q24/q25.
    //
    // Scale shape: candidate generation is an equi-join on term with
    // per-term fan-out bounded by df <= 50 (<= 2450 directed pairs per
    // term) — never all-pairs; the per-doc window is partitioned. At
    // 100 TB the df cap is what keeps this linear in corpus size.
    QueryDef(
      "q157_sparse_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // features are 3-gram shingles WITH multiplicity (the corpus
        // vocabulary is tiny, so unigrams are all stopword-like; the
        // shingle space is where documents are distinctive). The gram
        // pass + posting self-join is the SHARED materialized artifact
        // (SimGraph, built once per session/dataset); this query pays
        // only its ranking window over the skinny pair table.
        val pairs = graft.queries.SimGraph.directedPairs(s, d)
          .select(col("da").as("doc_a"), col("db").as("doc_b"),
            col("dot"), col("ns").as("n_shared"))
        val w = Window.partitionBy("doc_a")
          .orderBy(col("dot").desc, col("doc_b"))
        pairs
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("doc_a", "rank", "doc_b", "dot", "n_shared")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        tok AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS term
          FROM tk),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        rare AS (
          SELECT term FROM tf GROUP BY term
          HAVING COUNT(*) BETWEEN 2 AND 50),
        posting AS (
          SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN rare USING (term)),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot,
            COUNT(*) AS n_shared
          FROM posting a JOIN posting b
            ON a.term = b.term AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_a
            ORDER BY dot DESC, doc_b) AS rank
          FROM pairs)
        SELECT doc_a, rank, doc_b, dot, n_shared
        FROM ranked WHERE rank <= 3""")),

    // ---- q195: source vocabulary overlap matrix — how much 3-gram
    //      shingle vocabulary do source pairs share? Distinct
    //      shingles per source, pair join keyed on the shingle
    //      (bounded by per-shingle source fan-out <= |sources|, never
    //      a sources×sources product of vocabularies), with the
    //      overlap coefficient as exact integer |A∩B| / min(|A|,|B|)
    //      numerator/denominator. The corpus-mixing diagnostic:
    //      near-identical vocabularies mean redundant sources. ----
    QueryDef(
      "q195_source_overlap",
      (s, d) => {
        // compiled positional 3-gram kernel — string-identical to the
        // HOF form (consecutive lowercased tokens joined by ' '),
        // duplicates kept for tf, one codegen'd pass per row
        val grams = graft.functions.HashFunctions
          .ngramJoin(tokens(lower(col("text"))), 3)
        // conditional input spread (no-op on a parallel scan): the
        // shingle kernel and the distinct's map-side dedup ran on the
        // single scan task
        val sv = graft.operators.InputSpread.byKey(
          t(s, d, "documents")
            .select(col("doc_id"), col("source"), col("text")),
          col("doc_id"))
          .select(col("source"), explode(grams).as("g"))
          .distinct()
        val vocab = sv.groupBy("source").agg(count(lit(1)).as("v"))
        val inter = sv.select(col("g"), col("source").as("sa"))
          .join(sv.select(col("g"), col("source").as("sb")), Seq("g"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb")
          .agg(count(lit(1)).as("n_shared"))
        inter
          .join(broadcast(vocab.select(col("source").as("sa"),
            col("v").as("v_a"))), Seq("sa"))
          .join(broadcast(vocab.select(col("source").as("sb"),
            col("v").as("v_b"))), Seq("sb"))
          .select(col("sa"), col("sb"), col("n_shared"), col("v_a"),
            col("v_b"), least(col("v_a"), col("v_b")).as("min_v"))
      },
      Some("""
        WITH tk AS (
          SELECT source,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        sv AS (
          SELECT DISTINCT source, unnest(list_transform(
            generate_series(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
          FROM tk),
        vocab AS (SELECT source, COUNT(*) AS v FROM sv GROUP BY 1),
        inter AS (
          SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_shared
          FROM sv a JOIN sv b ON a.g = b.g AND a.source < b.source
          GROUP BY 1, 2)
        SELECT i.sa, i.sb, i.n_shared, va.v AS v_a, vb.v AS v_b,
          least(va.v, vb.v) AS min_v
        FROM inter i
        JOIN vocab va ON va.source = i.sa
        JOIN vocab vb ON vb.source = i.sb""")),

    // ---- q196: length-distribution skewness sufficient statistics —
    //      per (source, lang): exact integer raw moments of the
    //      RECENTERED doc length (x − 300; without recentring
    //      n²·Σx³ overflows int64 three orders earlier), from which
    //      the skewness numerator n²Σx′³ − 3nΣx′Σx′² + 2(Σx′)³
    //      ships as int64. The long-tail shape audit behind length-
    //      bucketed batch packing. ----
    QueryDef(
      "q196_skewness_stats",
      (s, d) => {
        val x = (col("n_chars") - 300).as("x")
        t(s, d, "documents")
          .select(col("source"), col("lang"), x)
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("s1"),
            sum(col("x") * col("x")).as("s2"),
            sum(col("x") * col("x") * col("x")).as("s3"))
          .withColumn("skew_num",
            col("n") * col("n") * col("s3")
              - lit(3L) * col("n") * col("s1") * col("s2")
              + lit(2L) * col("s1") * col("s1") * col("s1"))
      },
      Some("""
        WITH ev AS (
          SELECT source, lang, n_chars - 300 AS x FROM documents)
        SELECT source, lang, COUNT(*) AS n,
          CAST(SUM(x) AS BIGINT) AS s1,
          CAST(SUM(x * x) AS BIGINT) AS s2,
          CAST(SUM(x * x * x) AS BIGINT) AS s3,
          COUNT(*) * COUNT(*) * CAST(SUM(x * x * x) AS BIGINT)
            - 3 * COUNT(*) * CAST(SUM(x) AS BIGINT)
              * CAST(SUM(x * x) AS BIGINT)
            + 2 * CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT)
              * CAST(SUM(x) AS BIGINT) AS skew_num
        FROM ev GROUP BY 1, 2""")),

    // ---- q217: n-gram novelty — per-document memorization-risk audit:
    //      what fraction of a doc's distinct word 3-grams appear in NO
    //      other document? High-novelty docs carry unique content (PII,
    //      rare knowledge — the rows a dedup pass can't defend); low
    //      novelty means the doc restates the corpus. One tf pass,
    //      one combinable df aggregate over the gram domain, one
    //      gram-keyed join back — the q72 shuffle budget with a df=1
    //      twist, never a pair join. ----
    QueryDef(
      "q217_ngram_novelty",
      (s, d) => {
        // conditional spread (no-op on a parallel scan): the shingle
        // kernel otherwise runs on the scan's single task
        val grams = graft.operators.InputSpread.byKey(
            t(s, d, "documents").select(col("doc_id"), col("text")),
            col("doc_id"))
          .select(col("doc_id"),
            explode(array_distinct(wordShingles(col("text"), 3)))
              .as("g"))
        // per-gram df as a count over a g-partitioned window, NOT a
        // groupBy(g) + join back (r14): the join form ran the shingle
        // kernel TWICE (partial-agg side vs raw join side — no
        // ReusedExchange point) and the r13 persist attempt measured
        // WORSE (2.30 → 2.48 s — caching exploded rows loses). The
        // window ships each row through ONE g exchange and reads df in
        // place. Same value: grams is per-doc distinct, so the g
        // partition row count IS countDistinct(doc_id).
        val wg = org.apache.spark.sql.expressions.Window.partitionBy("g")
        grams.withColumn("df", count(lit(1)).over(wg))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
          .withColumn("novelty_ppm",
            expr("n_unique * 1000000 div n_grams"))
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
            regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(toks) - 1),
            i -> array_to_string(list_slice(toks, i, i + 2), ' '))))
            AS g
          FROM tk WHERE len(toks) >= 3),
        df AS (
          SELECT g, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM g GROUP BY 1)
        SELECT doc_id, COUNT(*) AS n_grams,
          CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_unique,
          CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000 // COUNT(*) AS novelty_ppm
        FROM g JOIN df USING (g)
        GROUP BY doc_id""")),

    // ---- q228: hashing-trick collision audit — before committing to
    //      a 1024-bucket feature-hashed vectorizer, measure what the
    //      collisions actually cost per document: distinct tokens vs
    //      distinct md5-derived buckets (the q57 portable hex idiom,
    //      so both engines hash identically). Pure per-row HOF over
    //      the token set + one aggregate — no shuffle beyond the scan.
    //      The birthday-bound check every hashing-trick pipeline
    //      should run and almost none do. ----
    QueryDef(
      "q228_feature_hashing",
      (s, d) => {
        val buckets = transform(
          array_distinct(tokens(lower(col("text")))),
          tk => pmod(conv(substring(md5(tk), 1, 8), 16, 10).cast("long"),
            lit(1024L)))
        t(s, d, "documents")
          .select(col("doc_id"),
            size(array_distinct(tokens(lower(col("text")))))
              .cast("long").as("n_tokens"),
            size(array_distinct(buckets)).cast("long").as("n_buckets"))
          .withColumn("n_collided", col("n_tokens") - col("n_buckets"))
          .withColumn("collision_ppm",
            expr("n_collided * 1000000 div n_tokens"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
            list_distinct(regexp_split_to_array(trim(lower(text)),
              '\s+')) AS toks
          FROM documents),
        b AS (
          SELECT doc_id, len(toks) AS n_tokens,
            len(list_distinct(list_transform(toks, tk ->
              ((strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1)
                  * 268435456
                + (strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1)
                  * 16777216
                + (strpos('0123456789abcdef', substr(md5(tk), 3, 1)) - 1)
                  * 1048576
                + (strpos('0123456789abcdef', substr(md5(tk), 4, 1)) - 1)
                  * 65536
                + (strpos('0123456789abcdef', substr(md5(tk), 5, 1)) - 1)
                  * 4096
                + (strpos('0123456789abcdef', substr(md5(tk), 6, 1)) - 1)
                  * 256
                + (strpos('0123456789abcdef', substr(md5(tk), 7, 1)) - 1)
                  * 16
                + (strpos('0123456789abcdef', substr(md5(tk), 8, 1)) - 1))
                % 1024))) AS n_buckets
          FROM d)
        SELECT doc_id, n_tokens, n_buckets,
          n_tokens - n_buckets AS n_collided,
          (n_tokens - n_buckets) * 1000000 // n_tokens AS collision_ppm
        FROM b""")),

    // ---- q242: language-ID confusion matrix — q18's classifier
    //      evaluated against its labels as the (labeled, detected)
    //      count matrix plus per-cell correctness: the eval readout
    //      that turns a classifier query into a measured component.
    //      One combinable aggregate over q18's per-row output. ----
    QueryDef(
      "q242_langid_confusion",
      (s, d) =>
        t(s, d, "documents")
          .select(col("lang").as("labeled"),
            langId(col("text")).as("detected"))
          .groupBy("labeled", "detected")
          .agg(count(lit(1)).as("n"))
          .withColumn("is_correct",
            (col("labeled") === col("detected")).cast("long")),
      Some(s"""
        WITH d AS ($langIdOracle)
        SELECT labeled_lang AS labeled, detected_lang AS detected,
          COUNT(*) AS n,
          CAST(CASE WHEN labeled_lang = detected_lang THEN 1 ELSE 0 END
            AS BIGINT) AS is_correct
        FROM d GROUP BY 1, 2""")),

    // ---- q251: context-window fit — what share of documents fits in
    //      each training context length (128/256/512/1024 BPE-ish
    //      tokens, the q60 tokenizer)? The packing-policy input: the
    //      smallest context that holds ~all docs sets the budget, the
    //      overflow share sets the chunking need. One token-count scan
    //      + a 4-row broadcast of context sizes. ----
    QueryDef(
      "q251_ctx_fit",
      (s, d) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
        val n = t(s, d, "documents")
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0)))
              .cast("long").as("n_tok"))
        val ctx = n.sparkSession.range(7, 11)
          .select(expr("shiftleft(1L, cast(id as int))").as("ctx"))
        n.crossJoin(broadcast(ctx))
          .groupBy("ctx")
          .agg(count(lit(1)).as("n_docs"),
            sum((col("n_tok") <= col("ctx")).cast("long")).as("n_fit"))
          .withColumn("fit_ppm", expr("n_fit * 1000000 div n_docs"))
      },
      Some("""
        WITH n AS (
          SELECT doc_id, CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
            AS BIGINT) AS n_tok
          FROM documents),
        ctx AS (SELECT unnest([128, 256, 512, 1024]) AS ctx)
        SELECT ctx, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN n_tok <= ctx THEN 1 ELSE 0 END) AS BIGINT)
            AS n_fit,
          CAST(SUM(CASE WHEN n_tok <= ctx THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000 // COUNT(*) AS fit_ppm
        FROM n, ctx GROUP BY ctx""")),

    // ---- q252: language fertility — chars-per-token by language,
    //      referenced to English (the multilingual budget table: a
    //      language at 1.4× English fertility needs 1.4× the token
    //      budget for the same text volume). Exact integer ppm ratios
    //      off one combinable per-lang aggregate + a one-row English
    //      broadcast. ----
    QueryDef(
      "q252_lang_fertility",
      (s, d) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
        val per = t(s, d, "documents")
          .select(col("lang"),
            length(col("text")).cast("long").as("chars"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0)))
              .cast("long").as("toks"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("chars")).as("sum_chars"),
            sum(col("toks")).as("sum_toks"))
          .withColumn("cpt_ppm",
            expr("sum_chars * 1000000 div sum_toks"))
        val en = per.filter(col("lang") === "en")
          .select(col("cpt_ppm").as("en_cpt_ppm"))
        per.crossJoin(broadcast(en))
          .withColumn("vs_en_ppm",
            expr("cpt_ppm * 1000000 div en_cpt_ppm"))
      },
      Some("""
        WITH per AS (
          SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
            CAST(SUM(len(regexp_extract_all(text,
              '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))
              AS BIGINT) AS sum_toks
          FROM documents GROUP BY 1),
        w AS (
          SELECT *, sum_chars * 1000000 // sum_toks AS cpt_ppm
          FROM per),
        en AS (
          SELECT cpt_ppm AS en_cpt_ppm FROM w WHERE lang = 'en')
        SELECT lang, n_docs, sum_chars, sum_toks, cpt_ppm,
          en_cpt_ppm, cpt_ppm * 1000000 // en_cpt_ppm AS vs_en_ppm
        FROM w, en""")),

    // ---- q301: RAKE keyword statistics (Rose et al. 2010) — word
    //      freq and co-occurrence DEGREE over stopword-delimited
    //      candidate phrases, the keyword-extraction primitive:
    //      degree(w) = Σ over w's phrase occurrences of the phrase
    //      length (self included), freq(w) = occurrence count; the
    //      RAKE score is degree/freq, emitted here as its two exact
    //      integer components (the division is the reader's — a
    //      float ratio column would be the only inexact thing in the
    //      row). Phrase segmentation: tokens break at a fixed 10-word
    //      stopword set; run ids come from a stopword-prefix-count
    //      window PARTITIONED BY doc (never global). The phrase
    //      aggregate keys on (doc, run) — combinable, corpus-wide
    //      parallelism. ----
    QueryDef(
      "q301_rake_scores",
      (s, d) => {
        val stops = Seq("the", "of", "and", "a", "to", "in", "is",
          "it", "for", "on")
        // segmentation kernel shared with the Round11Spec parity test
        // (see rakeTokPlen's scaladoc for the one-pass shape)
        rakeTokPlen(t(s, d, "documents"), stops)
          .groupBy("tok")
          .agg(count(lit(1)).as("freq"),
            sum(col("plen").cast("long")).as("degree"))
          .filter(col("freq") >= 5)
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        z AS (
          SELECT doc_id,
            unnest(generate_series(1, len(tk))) AS pos,
            unnest(tk) AS tok
          FROM d),
        f AS (
          SELECT doc_id, pos, tok,
            CASE WHEN tok IN ('the','of','and','a','to','in','is',
              'it','for','on') THEN 1 ELSE 0 END AS stop
          FROM z),
        r AS (
          SELECT *, SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING) AS run
          FROM f),
        -- tok <> '' pins the empty-document semantics: splitting an
        -- empty/whitespace-only text yields a single '' token (both
        -- engines), which is NOT a keyword — rakeTokPlen drops the
        -- empty segment, so the oracle must drop the '' token too
        nw AS (SELECT * FROM r WHERE stop = 0 AND tok <> ''),
        ph AS (
          SELECT doc_id, run, COUNT(*) AS plen
          FROM nw GROUP BY 1, 2)
        SELECT tok, COUNT(*) AS freq,
          CAST(SUM(plen) AS BIGINT) AS degree
        FROM nw JOIN ph USING (doc_id, run)
        GROUP BY tok HAVING COUNT(*) >= 5""")),

    // ---- q304: skip-gram co-occurrence counts — the (center,
    //      context) pair table a word2vec-style embedding trainer
    //      consumes, window ±2 (q155's PMI is ADJACENT bigrams only;
    //      context windows are the general shape). Spark-first the
    //      window predicate is NOT a range join: for each offset
    //      k ∈ {1, 2} the pair generator is a plain equi-join on
    //      (doc_id, pos + k), so shuffle keys stay composite integers
    //      and no inequality join ever plans; both directions emit
    //      from the same join. Counts are exact integers; the
    //      cnt ≥ 20 support floor bounds output like q185's. ----
    QueryDef(
      "q304_skipgram_counts",
      (s, d) => {
        // r13: the ±k neighbor is lead(tok, k) over (doc_id, pos) —
        // one window pass replaces the two position self-joins
        // (guide §3.3: the old plan ran the tokenize+posexplode
        // generator EIGHT times — 4 union branches × 2 join sides —
        // and broadcast the full exploded position table four times,
        // one BroadcastHashJoin per branch, just to look ±2 slots
        // sideways in the SAME document's sequence). The 4 directed
        // pair types then emit from ONE codegen'd generator (explode
        // of a 4-struct array — deliberately NOT a filter() HOF,
        // which runs interpreted per element) with document edges
        // dropped by a plain null filter. Hash-exact vs the unchanged
        // 4-way self-join oracle. Plan: generator once, one doc_id
        // Exchange + Window, zero joins.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        val pairs = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(lower(col("text"))), "\\s+")))
          .select(col("doc_id"), col("pos"), col("col").as("tok"))
          .select(col("tok"),
            lead(col("tok"), 1).over(w).as("c1"),
            lead(col("tok"), 2).over(w).as("c2"))
          .select(explode(array(
            struct(col("tok").as("center"), col("c1").as("context")),
            struct(col("c1").as("center"), col("tok").as("context")),
            struct(col("tok").as("center"), col("c2").as("context")),
            struct(col("c2").as("center"), col("tok").as("context"))))
            .as("p"))
          .select(col("p.center").as("center"),
            col("p.context").as("context"))
          .filter(col("center").isNotNull && col("context").isNotNull)
        pairs.groupBy("center", "context")
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 20)
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        z AS (
          SELECT doc_id,
            unnest(generate_series(1, len(tk))) AS pos,
            unnest(tk) AS tok
          FROM d),
        p AS (
          SELECT a.tok AS center, b.tok AS context
          FROM z a JOIN z b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          UNION ALL
          SELECT b.tok, a.tok
          FROM z a JOIN z b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          UNION ALL
          SELECT a.tok, b.tok
          FROM z a JOIN z b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 2
          UNION ALL
          SELECT b.tok, a.tok
          FROM z a JOIN z b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 2)
        SELECT center, context, COUNT(*) AS cnt
        FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 20""")),

    // ---- q305: term burstiness — the Fano factor var/mean of a
    //      term's PER-DOCUMENT count, zeros included (Church & Gale
    //      1995: content words are bursty, Fano ≫ 1; function words
    //      are Poisson-ish, Fano ≈ 1) — the corpus statistic that
    //      separates topical terms from background for stopword
    //      induction and keyword weighting. With N docs, total count
    //      T and per-doc sum of squares S2 (absent docs contribute 0
    //      to both), population var/mean = (N·S2 − T²)/(N·T) — so
    //      the Fano NUMERATOR and DENOMINATOR are exact int64 off
    //      one (term, doc) aggregate, and the ratio is the single
    //      shared division. df ≥ 10 bounds output; N rides a one-row
    //      broadcast. ----
    QueryDef(
      "q305_term_burstiness",
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val perDoc = docs
          .select(col("doc_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
          .groupBy("tok", "doc_id")
          .agg(count(lit(1)).as("c"))
        perDoc.groupBy("tok")
          .agg(count(lit(1)).as("df"), sum(col("c")).as("total"),
            sum(expr("c * c")).as("sum_sq"))
          .filter(col("df") >= 10)
          .crossJoin(broadcast(n))
          .withColumn("fano_num",
            expr("n_docs * sum_sq - total * total"))
          .withColumn("fano_den", expr("n_docs * total"))
          .withColumn("fano", expr(
            "CAST(n_docs * sum_sq - total * total AS DOUBLE)" +
              " / CAST(n_docs * total AS DOUBLE)"))
          .select("tok", "df", "total", "sum_sq", "fano_num",
            "fano_den", "fano")
      },
      Some("""
        WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        pd AS (
          SELECT tok, doc_id, COUNT(*) AS c FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(trim(lower(text)),
                '\s+')) AS tok
            FROM documents)
          GROUP BY 1, 2),
        g AS (
          SELECT tok, COUNT(*) AS df,
            CAST(SUM(c) AS BIGINT) AS total,
            CAST(SUM(c * c) AS BIGINT) AS sum_sq
          FROM pd GROUP BY 1 HAVING COUNT(*) >= 10)
        SELECT tok, df, total, sum_sq,
          n_docs * sum_sq - total * total AS fano_num,
          n_docs * total AS fano_den,
          CAST(n_docs * sum_sq - total * total AS DOUBLE)
            / CAST(n_docs * total AS DOUBLE) AS fano
        FROM g, n""")),

    // ---- q322: interpolated Kneser-Ney bigram smoothing (Kneser &
    //      Ney 1995; Chen & Goodman 1999 eq. 4.20) — THE n-gram LM
    //      estimator: Pkn(w2|w1) = max(c12−d,0)/c1 + d·N1+(w1·)/c1 ·
    //      N1+(·w2)/B with d = 0.75. The continuation count N1+(·w2)
    //      (how many DISTINCT left contexts w2 follows) replaces raw
    //      frequency in the backoff — the reason "francisco" gets a
    //      tiny unigram weight despite being frequent. All four
    //      inputs (c12, c1, N1+ forward/backward) are exact int64
    //      off ONE bigram aggregate; the probability is mirrored
    //      literal IEEE arithmetic, so the doubles hash-match.
    //
    //      Scale shape: one (doc_id,pos)-keyed self-join builds
    //      bigrams, then everything is combinable aggregates over
    //      (w1,w2) rows; the w1/w2 marginals join back by single-word
    //      key and the bigram-type total B rides a one-row broadcast.
    //      Text never shuffles. ----
    QueryDef(
      "q322_kneser_ney",
      (s, d) => {
        val tokpos = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(lower(col("text"))), "\\s+")))
          .select(col("doc_id"), col("pos"), col("col").as("tok"))
        val bi = tokpos.select(col("doc_id"), col("pos"),
            col("tok").as("w1"))
          .join(tokpos.select(col("doc_id"),
            (col("pos") - 1).as("pos"), col("tok").as("w2")),
            Seq("doc_id", "pos"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val left = bi.groupBy("w1")
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1_fwd"))
        val right = bi.groupBy("w2").agg(count(lit(1)).as("n1_bwd"))
        val total = bi.agg(count(lit(1)).as("bt"))
        val pkn =
          ((col("c12").cast("double") - lit(0.75)) /
            col("c1").cast("double")) +
            (((lit(0.75) * col("n1_fwd").cast("double")) /
              col("c1").cast("double")) *
              (col("n1_bwd").cast("double") / col("bt").cast("double")))
        bi.filter(col("c12") >= 10)
          .join(left, Seq("w1")).join(right, Seq("w2"))
          .crossJoin(broadcast(total))
          .select(col("w1"), col("w2"), col("c12"), col("c1"),
            col("n1_fwd"), col("n1_bwd"), pkn.as("pkn"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        z AS (
          SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos,
            unnest(tk) AS tok
          FROM d),
        bi AS (
          SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS c12
          FROM z a JOIN z b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          GROUP BY 1, 2),
        l AS (
          SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
            COUNT(*) AS n1_fwd
          FROM bi GROUP BY 1),
        r AS (SELECT w2, COUNT(*) AS n1_bwd FROM bi GROUP BY 1),
        bt AS (SELECT COUNT(*) AS b FROM bi)
        SELECT bi.w1, bi.w2, bi.c12, l.c1, l.n1_fwd, r.n1_bwd,
          ((CAST(bi.c12 AS DOUBLE) - 0.75) / CAST(l.c1 AS DOUBLE))
            + (((0.75 * CAST(l.n1_fwd AS DOUBLE)) / CAST(l.c1 AS DOUBLE))
              * (CAST(r.n1_bwd AS DOUBLE) / CAST(bt.b AS DOUBLE)))
            AS pkn
        FROM bi
        JOIN l ON bi.w1 = l.w1
        JOIN r ON bi.w2 = r.w2
        CROSS JOIN bt
        WHERE bi.c12 >= 10""")),

    // ---- q328: Good-Turing frequency-of-frequencies (Good 1953) —
    //      the OTHER classical smoothing estimator next to q322's
    //      Kneser-Ney: for each observed count r, how many distinct
    //      types occur exactly r times (N_r), and the GT-adjusted
    //      count r* = (r+1)·N_{r+1}/N_r that reallocates mass toward
    //      unseen events (r*=0's N_1/N is the unseen-mass estimate).
    //      The N_r table is THE corpus-frequency fingerprint (Zipf
    //      fit, q124, reads its slope; vocabulary truncation reads
    //      its head). Integer numerator (r+1)·N_{r+1} and
    //      denominator N_r ship exactly; r* is the one mirrored
    //      division (0 when N_{r+1} = 0 — both sides emit 0.0 via
    //      the same 0/N_r).
    //
    //      Scale shape: one map-side-combinable wordcount, then a
    //      count-keyed aggregate over |vocab| skinny rows; the r+1
    //      lookup is an equi-self-join on the tiny N_r table. ----
    QueryDef(
      "q328_good_turing",
      (s, d) => {
        val wc = t(s, d, "documents")
          .select(explode(split(trim(lower(col("text"))), "\\s+"))
            .as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        val fof = wc.groupBy(col("c").as("r"))
          .agg(count(lit(1)).as("n_r"))
        fof.join(fof.select((col("r") - 1).as("r"),
            col("n_r").as("n_r1")), Seq("r"), "left")
          .select(col("r"), col("n_r"),
            coalesce(col("n_r1"), lit(0L)).as("n_r1"))
          .withColumn("gt_num", (col("r") + 1) * col("n_r1"))
          .withColumn("r_star",
            col("gt_num").cast("double") / col("n_r").cast("double"))
      },
      Some("""
        WITH wc AS (
          SELECT tok, COUNT(*) AS c FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)),
              '\s+')) AS tok
            FROM documents) z
          GROUP BY tok),
        fof AS (SELECT c AS r, COUNT(*) AS n_r FROM wc GROUP BY c)
        SELECT a.r, a.n_r, COALESCE(b.n_r, 0) AS n_r1,
          (a.r + 1) * COALESCE(b.n_r, 0) AS gt_num,
          CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE)
            / CAST(a.n_r AS DOUBLE) AS r_star
        FROM fof a LEFT JOIN fof b ON b.r = a.r + 1""")),

    // ---- q345: trending terms, week over week — the monitoring
    //      query behind every "what's suddenly hot" feed: per (week,
    //      token) counts from the EVENT-SIDE join of documents to
    //      engagement (docs carry no time, so a doc's week = the
    //      weeks its id-matched events land in — deterministic and
    //      SF-stable), smoothed growth ratio vs the previous week in
    //      integer ppm ((c_now·1e6) div (c_prev + 1): +1 absorbs
    //      new-term division by zero and both engines floor-divide),
    //      gated on min support 20. Rank stays per-week (partitioned
    //      window), ties broken lexically.
    //
    //      Scale shape: one (week, tok) combinable wordcount; the
    //      week-1 lookup is an equi-self-join on the (week+1, tok)
    //      key; the rank window partitions by week. ----
    QueryDef(
      "q345_trending_terms",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("week")
          .orderBy(col("ratio_ppm").desc, col("tok"))
        val docWeek = t(s, d, "events")
          .select((col("event_id") % 10000).as("doc_id"),
            expr("ts div 604800000000").as("week"))
          .distinct()
        val wk = t(s, d, "documents")
          .select(col("doc_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
          .join(docWeek, Seq("doc_id"))
          .groupBy("week", "tok").agg(count(lit(1)).as("c"))
        wk.join(wk.select((col("week") + 1).as("week"),
            col("tok"), col("c").as("c_prev")), Seq("week", "tok"), "left")
          .filter(col("c") >= 20)
          .withColumn("c_prev", coalesce(col("c_prev"), lit(0L)))
          .withColumn("ratio_ppm",
            expr("c * 1000000 div (c_prev + 1)"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select("week", "rk", "tok", "c", "c_prev", "ratio_ppm")
      },
      Some("""
        WITH dw AS (
          SELECT DISTINCT event_id % 10000 AS doc_id,
            epoch_us(ts) // 604800000000 AS week
          FROM events),
        tk AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS tok
          FROM documents),
        wk AS (
          SELECT dw.week, tk.tok, COUNT(*) AS c
          FROM tk JOIN dw ON tk.doc_id = dw.doc_id
          GROUP BY 1, 2),
        j AS (
          SELECT a.week, a.tok, a.c, COALESCE(b.c, 0) AS c_prev,
            a.c * 1000000 // (COALESCE(b.c, 0) + 1) AS ratio_ppm
          FROM wk a LEFT JOIN wk b
            ON b.week = a.week - 1 AND b.tok = a.tok
          WHERE a.c >= 20),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY week
            ORDER BY ratio_ppm DESC, tok) AS rk
          FROM j)
        SELECT week, rk, tok, c, c_prev, ratio_ppm
        FROM r WHERE rk <= 10""")))

  /** DuckDB mirror of [[graft.functions.TextFunctions.langId]], built from
    * the same marker map: score = |distinct tokens ∩ markers| per
    * language; detected = alphabetically-first language reaching the max
    * score, 'und' when every score is zero.
    */
  private def langIdOracle: String = {
    val marks = langMarkers.toSeq.sortBy(_._1)
    val scoreCols = marks.map { case (l, ws) =>
      s"len(list_intersect(toks, [${ws.map(w => s"'$w'").mkString(",")}])) AS s_$l"
    }
    val best = marks.map(m => s"s_${m._1}").mkString("greatest(", ", ", ")")
    val cases = marks.map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }
    s"""
      WITH d AS (
        SELECT doc_id, lang AS labeled_lang,
          list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
        FROM documents),
      s AS (SELECT doc_id, labeled_lang, ${scoreCols.mkString(",\n        ")}
        FROM d),
      b AS (SELECT *, $best AS best FROM s)
      SELECT doc_id, labeled_lang,
        CASE WHEN best = 0 THEN 'und'
          ${cases.mkString("\n          ")}
          ELSE 'und' END AS detected_lang
      FROM b"""
  }
}
