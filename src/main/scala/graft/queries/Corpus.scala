package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t

/** Training-corpus preparation operators over `documents` (SURVEY §7.5
  * beyond-parity): BM25 relevance scoring, deterministic hash-based
  * train/val/test splitting, benchmark-contamination measurement, and
  * sliding-window token chunking.
  *
  * Scale design: every operator is one or two linear passes — corpus
  * statistics reduce to a single row that broadcasts back (q52), the
  * benchmark shingle set broadcasts (q54: benchmark ≪ corpus by
  * definition), and splitting/chunking are pure per-row expressions
  * with no shuffle at all.
  *
  * Cross-engine float parity: +, −, ×, ÷, sqrt are IEEE
  * correctly-rounded and bit-identical across engines on identical
  * inputs; log/exp/pow are libm-dependent and are NOT used in any
  * oracle-compared value. q52 therefore uses the BM25 idf ODDS RATIO
  * (N − df + 0.5)/(df + 0.5) as the term weight — the standard idf is
  * its log, which changes ranking monotonicity not at all for a single
  * term and only by log-compression across terms.
  */
object Corpus extends QueryPack {

  // BM25 shape parameters (Robertson-Sparck Jones defaults)
  val K1 = 1.2
  val B = 0.75
  val QueryTerms = Seq("spark", "vector", "merge")

  val ChunkLen = 16
  val ChunkStride = 12

  /** Non-distinct whitespace tokens — term frequency needs duplicates.
    * Delegates to the ONE tokenizer (TextFunctions.tokens) so every
    * query pack tokenizes exactly as the oracles were written against. */
  private def rawTokens(c: Column): Column =
    graft.functions.TextFunctions.tokens(c)

  /** Deterministic stratified sample: the k smallest rows per `lang`
    * stratum under the (md5(text), doc_id) order, with `rk` their rank.
    *
    * Scale design — the naive form (window over the whole corpus
    * partitioned by stratum) shuffles EVERYTHING into one task per
    * stratum: with 5 languages at 100 TB that is 5 tasks each sorting
    * billions of rows. Instead the corpus is pre-filtered map-side on a
    * per-stratum md5-prefix cutoff sized to keep ~k×`safety` rows, so
    * the per-stratum window sorts thousands of rows, not billions:
    *
    *   1. per-stratum totals (column-pruned scan + 5-row aggregate)
    *   2. cutoff_s = hash-space × k×safety / n_total_s (keep-all when
    *      the stratum is small); survivors = rows with 32-bit md5
    *      prefix below cutoff — a map-side filter, nothing shuffles
    *   3. exactness guard, fully declarative: a stratum is `ok` iff it
    *      kept ≥ min(k, n_total) survivors. The survivor set is a
    *      PREFIX of the hash order (hv < cutoff), so ok ⇒ it contains
    *      the true top-k: any non-survivor row is out-ranked by every
    *      one of the ≥ k survivors (its 8-hex prefix, hence its full
    *      md5 string, is strictly larger). Non-ok strata — md5
    *      uniformity makes them ~impossible at safety 8, but exactness
    *      must not rest on a probabilistic bound — fall back to the
    *      full stratum via a union branch that filters to zero rows in
    *      the normal case.
    *   4. one window over survivors ∪ fallback rows.
    *
    * The result is bit-identical to the naive window for ANY input —
    * CorpusSpec checks equivalence incl. an adversarial safety=0 run
    * that forces the fallback branch. */
  def stratifiedSample(docs: DataFrame, k: Int, safety: Long = 8L): DataFrame = {
    val space = 1L << 32
    // 32-bit numeric prefix of md5(text): lexicographic order on the
    // fixed-width lowercase-hex md5 string == numeric order on hv
    val hv = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    val budget = k.toLong * safety
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
    val cut = counts.withColumn("cutoff",
      when(col("n_total") <= budget, lit(space))
        .otherwise((lit(space.toDouble) * lit(budget.toDouble) /
          col("n_total").cast("double")).cast("long")))
    val tagged = docs.withColumn("hv", hv)
      .join(broadcast(cut), Seq("lang"))
    val surv = tagged.filter(col("hv") < col("cutoff"))
    val strata = surv.groupBy("lang").agg(count(lit(1)).as("n_surv"))
      .join(cut, Seq("lang"))
      .withColumn("ok", col("n_surv") >= least(lit(k.toLong), col("n_total")))
    // strata with zero survivors never appear in `strata`; they are
    // non-ok by definition and only reachable when cutoff == 0 rows
    // (safety = 0) — the anti-join below catches them too.
    val okLangs = strata.filter(col("ok")).select("lang")
    val good = surv.join(broadcast(okLangs), Seq("lang"), "left_semi")
    val bad = tagged.join(broadcast(okLangs), Seq("lang"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(md5(col("text")), col("doc_id"))
    good.unionByName(bad)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .drop("hv", "cutoff", "n_total")
  }

  /** One BM25 term score: odds-idf × saturated tf, all IEEE-exact ops. */
  private def bm25Term(tf: Column, df: Column, n: Column, dl: Column,
      avgdl: Column): Column = {
    val tfD = tf.cast("double")
    val idfOdds =
      (n.cast("double") - df.cast("double") + lit(0.5)) /
        (df.cast("double") + lit(0.5))
    idfOdds * (tfD * lit(K1 + 1)) /
      (tfD + lit(K1) * (lit(1 - B) + lit(B) * dl.cast("double") / avgdl))
  }

  def defs: Seq[QueryDef] = Seq(
    // ---- BM25 scoring against a fixed keyword query ----
    // Two linear passes: (1) corpus stats + per-term document
    // frequencies reduce to ONE row, (2) the row broadcasts back and
    // every score is a per-doc expression. No keyed shuffle anywhere.
    QueryDef(
      "q52_bm25",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), rawTokens(col("text")).as("toks"))
          .withColumn("dl", size(col("toks")))
        val withTf = QueryTerms.zipWithIndex.foldLeft(docs) {
          case (df0, (term, i)) =>
            df0.withColumn(s"tf$i",
              size(filter(col("toks"), x => x === lit(term))))
        }
        val stats = withTf.agg(
          count(lit(1)).as("n"),
          sum(col("dl")).as("sdl"),
          count(when(col("tf0") > 0, 1)).as("df0"),
          count(when(col("tf1") > 0, 1)).as("df1"),
          count(when(col("tf2") > 0, 1)).as("df2"))
        val scored = withTf
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            col("sdl").cast("double") / col("n").cast("double"))
        val score = QueryTerms.indices
          .map(i => bm25Term(col(s"tf$i"), col(s"df$i"), col("n"),
            col("dl"), col("avgdl")))
          .reduceLeft(_ + _)
        scored.select(col("doc_id"), score.as("bm25"))
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
            regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents),
        tf AS (
          SELECT doc_id, len(toks) AS dl,
            len(list_filter(toks, x -> x = 'spark')) AS tf0,
            len(list_filter(toks, x -> x = 'vector')) AS tf1,
            len(list_filter(toks, x -> x = 'merge')) AS tf2
          FROM d),
        stats AS (
          SELECT COUNT(*) AS n, SUM(dl) AS sdl,
            COUNT(*) FILTER (tf0 > 0) AS df0,
            COUNT(*) FILTER (tf1 > 0) AS df1,
            COUNT(*) FILTER (tf2 > 0) AS df2
          FROM tf)
        SELECT doc_id,
          (CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5)
            * (CAST(tf0 AS DOUBLE) * ${K1 + 1}) / (CAST(tf0 AS DOUBLE)
               + $K1 * ((1 - $B) + $B * CAST(dl AS DOUBLE)
                 / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
          + (CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)
            * (CAST(tf1 AS DOUBLE) * ${K1 + 1}) / (CAST(tf1 AS DOUBLE)
               + $K1 * ((1 - $B) + $B * CAST(dl AS DOUBLE)
                 / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
          + (CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)
            * (CAST(tf2 AS DOUBLE) * ${K1 + 1}) / (CAST(tf2 AS DOUBLE)
               + $K1 * ((1 - $B) + $B * CAST(dl AS DOUBLE)
                 / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
          AS bm25
        FROM tf, stats""")),

    // ---- Deterministic hash split: md5-derived bucket 0..255 →
    //      80/10/10 train/val/test, reproducible in ANY engine ----
    // The assignment is a pure per-row expression (no shuffle, no RNG
    // state): the same document lands in the same split on any cluster
    // size, any partitioning, any engine — the property that matters
    // when train/test splits must never leak across reruns.
    QueryDef(
      "q53_hash_split",
      (s, d) => {
        val hex = lit("0123456789abcdef")
        val h = md5(col("text"))
        val bucket =
          (instr(hex, substring(h, 1, 1)) - 1) * 16 +
            (instr(hex, substring(h, 2, 1)) - 1)
        t(s, d, "documents")
          .withColumn("split",
            when(bucket < 204, "train")
              .when(bucket < 230, "val")
              .otherwise("test"))
          .groupBy("lang", "split")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
      },
      Some("""
        WITH b AS (
          SELECT lang, n_chars,
            (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1)
              AS bucket
          FROM documents)
        SELECT lang,
          CASE WHEN bucket < 204 THEN 'train'
               WHEN bucket < 230 THEN 'val'
               ELSE 'test' END AS split,
          COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM b GROUP BY 1, 2""")),

    // ---- Benchmark contamination: fraction of each training doc's
    //      3-gram shingles that appear in the benchmark set ----
    // The benchmark set is small by definition, so its distinct shingle
    // set BROADCASTS — the corpus is scanned once and never shuffled on
    // content. (The reverse — shuffling the corpus' shingles — is the
    // plan that dies at 100 TB.)
    QueryDef(
      "q54_contamination",
      (s, d) => {
        import graft.functions.TextFunctions.wordShingles
        val docs = t(s, d, "documents")
          .select(col("doc_id"),
            wordShingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
        val bench = docs.filter(col("doc_id") % 20 === 0)
          .select(explode(col("sh")).as("shingle")).distinct()
        val corp = docs.filter(col("doc_id") % 20 =!= 0)
          .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"),
            explode(col("sh")).as("shingle"))
        corp
          .join(broadcast(bench.withColumn("hit", lit(1))),
            Seq("shingle"), "left")
          .groupBy("doc_id", "n_sh")
          .agg(count(col("hit")).as("n_contam"))
          .withColumn("ratio",
            col("n_contam").cast("double") / col("n_sh").cast("double"))
          .select("doc_id", "n_sh", "n_contam", "ratio")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
            regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(toks) - 1),
              i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
          FROM d WHERE len(toks) >= 3),
        bench AS (
          SELECT DISTINCT unnest(sh) AS shingle FROM sh
          WHERE doc_id % 20 = 0),
        corp AS (
          SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh
          WHERE doc_id % 20 <> 0)
        SELECT corp.doc_id, corp.n_sh,
          COUNT(bench.shingle) AS n_contam,
          CAST(COUNT(bench.shingle) AS DOUBLE) / CAST(corp.n_sh AS DOUBLE)
            AS ratio
        FROM corp LEFT JOIN bench USING (shingle)
        GROUP BY corp.doc_id, corp.n_sh""")),

    // ---- Sliding-window token chunking (context-length packing):
    //      length-16 windows at stride 12, trailing partial kept ----
    // Pure per-row explode: no shuffle, output size ≈ nt/stride rows
    // per doc regardless of cluster size.
    QueryDef(
      "q55_chunking",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), rawTokens(col("text")).as("toks"))
          .withColumn("nt", size(col("toks")))
        val chunks = transform(
          sequence(lit(0),
            ((col("nt") + ChunkStride - 1) / ChunkStride).cast("int") - 1),
          i => struct(
            array_join(
              slice(col("toks"), i * ChunkStride + 1, lit(ChunkLen)), " ")
              .as("chunk_text"),
            size(slice(col("toks"), i * ChunkStride + 1, lit(ChunkLen)))
              .as("n_toks")))
        docs
          .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "c")))
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            col("c.chunk_text"), col("c.n_toks"))
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
            regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents),
        n AS (SELECT doc_id, toks, len(toks) AS nt FROM d)
        SELECT doc_id,
          CAST(i AS BIGINT) AS chunk_idx,
          array_to_string(
            list_slice(toks, i * $ChunkStride + 1,
              i * $ChunkStride + $ChunkLen), ' ') AS chunk_text,
          len(list_slice(toks, i * $ChunkStride + 1,
            i * $ChunkStride + $ChunkLen)) AS n_toks
        FROM n, unnest(range(0, (nt + ${ChunkStride - 1}) // $ChunkStride))
          AS u(i)""")),

    // ---- Deterministic stratified sampling: fixed N per stratum,
    //      selected by hash order — balanced-corpus sampling that is
    //      reproducible across engines, partitionings, and reruns
    //      (md5 gives the shuffle, doc_id breaks ties; no RNG state,
    //      unlike df.sample whose output is engine-specific) ----
    QueryDef(
      "q63_stratified_sample",
      (s, d) => stratifiedSample(t(s, d, "documents"), k = 20)
        .select("lang", "rk", "doc_id", "n_chars"),
      Some("""
        SELECT lang, rk, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
            row_number() OVER (PARTITION BY lang
              ORDER BY md5(text), doc_id) AS rk
          FROM documents)
        WHERE rk <= 20""")),

    // ---- q99: leakage-free train/val/test split — assign splits by
    //      hashing the DUPLICATE-GROUP key (the canonical fingerprint)
    //      instead of the raw document, so every copy of a document
    //      lands in the same split and eval data can never leak a
    //      training twin (the q53 failure mode this fixes: hashing raw
    //      text scatters whitespace-variant copies across splits).
    //      Planted twins (trailing-blank variants of every
    //      doc_id%13==0 doc, same expression both engines) share a
    //      canonical fp but differ in raw md5 — the grouped split is
    //      provably leak-free while the naive split leaks (asserted
    //      in NewQueryPlanSpec; both split columns are emitted so the
    //      audit is value-certified cross-engine).
    //      Scale: both split assignments are pure per-row expressions
    //      — the group key IS the fingerprint, no group table to join;
    //      the only shuffle is the fp-keyed group-size count + join,
    //      shipping (16-byte fp, id, two 5-char splits). 80/10/10 via
    //      md5-hex buckets (<204 / <230 / rest of 256), exactly q53's
    //      discipline. ----
    QueryDef(
      "q99_grouped_split",
      (s, d) => {
        val hex = lit("0123456789abcdef")
        def bucket(h: Column): Column =
          (instr(hex, substring(h, 1, 1)) - 1) * 16 +
            (instr(hex, substring(h, 2, 1)) - 1)
        def splitOf(b: Column): Column =
          when(b < 204, "train").when(b < 230, "val").otherwise("test")
        import graft.functions.TextFunctions.normText
        val base = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        val twins = base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 7000000L).as("doc_id"), col("source"),
            concat(col("text"), lit("  ")).as("text"))
        val c = base.unionByName(twins)
          .select(col("doc_id"), col("source"),
            md5(normText(col("text"))).as("fp"),
            splitOf(bucket(md5(col("text")))).as("split_naive"))
          .withColumn("split_grouped",
            splitOf(bucket(md5(concat(lit("grp:"), col("fp"))))))
        c.join(c.groupBy("fp").agg(count(lit(1)).as("grp_n")), Seq("fp"))
          .select(col("doc_id"), col("source"), col("fp"),
            col("split_grouped"), col("split_naive"), col("grp_n"))
      },
      Some("""
        WITH base AS (SELECT doc_id, source, text FROM documents),
        tw AS (
          SELECT doc_id + 7000000 AS doc_id, source, text || '  ' AS text
          FROM base WHERE doc_id % 13 = 0),
        c AS (
          SELECT doc_id, source,
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
            CASE WHEN (strpos('0123456789abcdef',
                  substr(md5(text), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                  substr(md5(text), 2, 1)) - 1) < 204 THEN 'train'
              WHEN (strpos('0123456789abcdef',
                  substr(md5(text), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                  substr(md5(text), 2, 1)) - 1) < 230 THEN 'val'
              ELSE 'test' END AS split_naive
          FROM (SELECT * FROM base UNION ALL SELECT * FROM tw)),
        c2 AS (
          SELECT *,
            CASE WHEN (strpos('0123456789abcdef',
                  substr(md5('grp:' || fp), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                  substr(md5('grp:' || fp), 2, 1)) - 1) < 204 THEN 'train'
              WHEN (strpos('0123456789abcdef',
                  substr(md5('grp:' || fp), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                  substr(md5('grp:' || fp), 2, 1)) - 1) < 230 THEN 'val'
              ELSE 'test' END AS split_grouped
          FROM c),
        g AS (
          SELECT fp, CAST(count(*) AS BIGINT) AS grp_n
          FROM c2 GROUP BY fp)
        SELECT doc_id, source, fp, split_grouped, split_naive, grp_n
        FROM c2 JOIN g USING (fp)""")),

    // ---- q111: decontamination by SPAN EXCISION — q54 measures
    //      benchmark overlap; this removes it. Every corpus token
    //      covered by a benchmark-matching 3-gram window is excised
    //      (Lee et al. 2022 excise duplicated substrings the same
    //      way; document-level dropping throws away the whole doc for
    //      one quoted sentence). Output per corpus doc: token counts
    //      before/after, excised count, and the md5 of the CLEANED
    //      token stream — a value-certified digest of the rebuilt
    //      document, not just counts.
    //      Scale: gram fingerprints join the broadcast benchmark set
    //      (benchmark ≪ corpus by definition); matched gram START
    //      positions collapse to ONE small int-array row per affected
    //      doc (ids-only doc-keyed shuffle — q90's reassembly
    //      discipline); text is touched by a single doc-keyed join
    //      (Catalyst broadcasts the affected-doc set while it is
    //      small, merges when it is not); mask expansion ([p, p+2]
    //      union) and token reassembly are per-row HOFs. ----
    QueryDef(
      "q111_decontaminate",
      (s, d) => {
        // tokenized table persisted: it feeds THREE passes (benchmark
        // grams, corpus grams, the reassembly join-back) — cache it
        // once instead of re-splitting the text each time (embedders
        // clearCache per query, QueryDef contract)
        // conditional spread by doc_id off the single-task scan (guide
        // §2.4/§2.5): the tokenize kernel and all THREE cached passes
        // previously ran single-core (the scan is one task and persist
        // freezes that layout). Keying on doc_id lets the hits
        // aggregate and the final doc-keyed join-back reuse this
        // partitioning with no further exchange; on a many-file table
        // the gate makes it a no-op — raw text rows are never shuffled
        // just to spread them.
        val docs = graft.operators.InputSpread.byKey(
            t(s, d, "documents"), col("doc_id"))
          .select(col("doc_id"), rawTokens(col("text")).as("toks"))
          .persist()
        // gram fingerprints: compiled positional gram kernel + codegen
        // xxhash64 → 8-byte fps, so the probe side explodes longs, not
        // 32-char hex strings. Positions (not fps) reach the output, so
        // any 64-bit fp works; at true 100 TB corpus scale swap in the
        // 16-byte ngramMd5 kernel (collision odds over ~1e10 grams) —
        // the plan shape is identical.
        val grams = graft.functions.HashFunctions.ngramJoin(col("toks"), 3)
        val bench = docs.filter(col("doc_id") % 20 === 0)
          .select(explode(grams).as("g"))
          .select(xxhash64(col("g")).as("gfp")).distinct()
        val corpus = docs.filter(col("doc_id") % 20 =!= 0)
        val hits = corpus
          .select(col("doc_id"), posexplode(grams).as(Seq("p0", "g")))
          .select(col("doc_id"), col("p0"), xxhash64(col("g")).as("gfp"))
          .join(broadcast(bench), "gfp")
          .groupBy("doc_id")
          // gram start positions, 1-based (posexplode is 0-based)
          .agg(sort_array(collect_list(col("p0") + 1)).as("m"))
        corpus.join(hits, Seq("doc_id"), "left")
          .withColumn("m", coalesce(col("m"), array().cast("array<int>")))
          .withColumn("ex", array_distinct(flatten(
            transform(col("m"), p => array(p, p + 1, p + 2)))))
          // conditional short-circuit: the per-token mask walk
          // (O(tokens × |ex|)) only evaluates on CONTAMINATED docs —
          // the clean ~95% take the identity branch, so the excision
          // cost scales with the contamination rate, not corpus size
          .withColumn("kept",
            when(size(col("m")) === 0, col("toks"))
              .otherwise(transform(
                filter(sequence(lit(1), size(col("toks"))),
                  i => !array_contains(col("ex"), i)),
                i => element_at(col("toks"), i))))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(col("kept")).cast("long").as("n_kept"),
            (size(col("toks")) - size(col("kept"))).cast("long")
              .as("n_excised"),
            md5(array_join(col("kept"), " ")).as("clean_fp"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_transform(
              generate_series(1, greatest(len(toks) - 2, 0)),
              i -> md5(array_to_string(toks[i:i+2], ' ')))) AS gfp,
            unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS p
          FROM d),
        bench AS (
          SELECT DISTINCT gfp FROM g WHERE doc_id % 20 = 0),
        hits AS (
          SELECT g.doc_id, list_sort(list(g.p)) AS m
          FROM g JOIN bench USING (gfp)
          WHERE g.doc_id % 20 <> 0
          GROUP BY g.doc_id),
        ex AS (
          SELECT d.doc_id, d.toks,
            list_distinct(flatten(list_transform(
              COALESCE(hits.m, []),
              p -> [p, p + 1, p + 2]))) AS ex
          FROM d LEFT JOIN hits USING (doc_id)
          WHERE d.doc_id % 20 <> 0),
        kept AS (
          SELECT doc_id, toks,
            list_transform(
              list_filter(generate_series(1, len(toks)),
                i -> NOT list_contains(ex, i)),
              i -> toks[i]) AS kept
          FROM ex)
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(len(kept) AS BIGINT) AS n_kept,
          CAST(len(toks) - len(kept) AS BIGINT) AS n_excised,
          md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_fp
        FROM kept""")),

    // ---- q144: hybrid retrieval via reciprocal-rank fusion (Cormack
    //      et al. 2009, the standard lexical+vector combiner): each
    //      probe doc ranks the candidate pool twice — token-set
    //      Jaccard (the lexical arm; integer ppm) and embedding cosine
    //      (the vector arm; the repo's 2^40 quantization) — and the
    //      fused score is 10^6/(60+r_lex) + 10^6/(60+r_vec), ALL
    //      integer arithmetic, so the final top-10 is bit-exact in
    //      both engines. RRF needs only RANKS, never comparable raw
    //      scores — which is the point: at 100 TB each arm is its own
    //      retrieval index (q138's postings, q31's IVF), each
    //      returning a bounded candidate slate per probe, and the
    //      fusion is a per-probe window over slate-sized input. The
    //      demonstrator scores a bounded pool exhaustively so the
    //      oracle can certify the whole pipeline. ----
    QueryDef(
      "q144_rrf_fusion",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.TextFunctions.tokens
        import graft.functions.VectorFunctions.cosine
        val docs = t(s, d, "documents")
          .select(col("doc_id"),
            array_distinct(tokens(lower(col("text")))).as("toks"))
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val probes = docs.filter(col("doc_id") < 3)
          .join(e, col("doc_id") === col("vec_id"))
          .select(col("doc_id").as("probe_id"), col("toks").as("ptoks"),
            col("embedding").as("pv"))
        val cands = docs.filter(col("doc_id") >= 3 && col("doc_id") < 500)
          .join(e, col("doc_id") === col("vec_id"))
          .select(col("doc_id").as("cand_id"), col("toks").as("ctoks"),
            col("embedding").as("cv"))
        val inter = size(array_intersect(col("ptoks"), col("ctoks")))
          .cast("long")
        val union = size(col("ptoks")).cast("long") +
          size(col("ctoks")).cast("long") - inter
        val scored = cands.crossJoin(broadcast(probes))
          .select(col("probe_id"), col("cand_id"),
            inter.as("n_inter"), union.as("n_union"),
            floor(cosine(col("pv"), col("cv")) * 1099511627776.0 + 0.5)
              .cast("long").as("qcos"))
          .select(col("probe_id"), col("cand_id"),
            expr("n_inter * 1000000 div n_union").as("jac_ppm"),
            col("qcos"))
        val wLex = Window.partitionBy("probe_id")
          .orderBy(col("jac_ppm").desc, col("cand_id"))
        val wVec = Window.partitionBy("probe_id")
          .orderBy(col("qcos").desc, col("cand_id"))
        val ranked = scored
          .withColumn("r_lex", row_number().over(wLex).cast("long"))
          .withColumn("r_vec", row_number().over(wVec).cast("long"))
          .withColumn("rrf_ppm",
            expr("1000000 div (60 + r_lex) + 1000000 div (60 + r_vec)"))
        val wFuse = Window.partitionBy("probe_id")
          .orderBy(col("rrf_ppm").desc, col("cand_id"))
        ranked.withColumn("rank", row_number().over(wFuse).cast("long"))
          .filter(col("rank") <= 10)
          .select("probe_id", "rank", "cand_id", "r_lex", "r_vec",
            "rrf_ppm")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id,
            list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS toks
          FROM documents),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        probes AS (
          SELECT doc_id AS probe_id, toks AS ptoks, v AS pv
          FROM docs JOIN e ON doc_id = vec_id WHERE doc_id < 3),
        cands AS (
          SELECT doc_id AS cand_id, toks AS ctoks, v AS cv
          FROM docs JOIN e ON doc_id = vec_id
          WHERE doc_id >= 3 AND doc_id < 500),
        scored AS (
          SELECT probe_id, cand_id,
            CAST(len(list_intersect(ptoks, ctoks)) AS BIGINT) * 1000000
              // (CAST(len(ptoks) AS BIGINT) + len(ctoks)
                  - len(list_intersect(ptoks, ctoks))) AS jac_ppm,
            CAST(floor(list_dot_product(pv, cv)
              / (sqrt(list_dot_product(pv, pv))
                 * sqrt(list_dot_product(cv, cv)))
              * 1099511627776.0 + 0.5) AS BIGINT) AS qcos
          FROM cands, probes),
        ranked AS (
          SELECT *,
            row_number() OVER (PARTITION BY probe_id
              ORDER BY jac_ppm DESC, cand_id) AS r_lex,
            row_number() OVER (PARTITION BY probe_id
              ORDER BY qcos DESC, cand_id) AS r_vec
          FROM scored),
        fused AS (
          SELECT probe_id, cand_id,
            CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec,
            1000000 // (60 + r_lex) + 1000000 // (60 + r_vec) AS rrf_ppm
          FROM ranked)
        SELECT probe_id,
          CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY rrf_ppm DESC, cand_id) AS BIGINT) AS rank,
          cand_id, r_lex, r_vec, rrf_ppm
        FROM fused
        QUALIFY rank <= 10""")),

    // ---- q200: purged walk-forward split — time-series CV where each
    //      fold k tests on time-bucket k and trains on strictly earlier
    //      buckets MINUS an embargo window before the fold boundary
    //      (López de Prado's purged K-fold: rows whose influence leaks
    //      across the boundary are dropped, not trained on). All-integer
    //      µs arithmetic off a one-row min/max broadcast; the 4-row fold
    //      table cross-joins broadcast (bounded ×K fan-out, documented),
    //      then one combinable (fold, class) aggregate. The split audit
    //      a leakage-free temporal-model pipeline runs before training.
    //      ----
    QueryDef(
      "q200_purged_split",
      (s, d) => {
        val EmbargoUs = 86400000000L // 1 day
        val K = 5
        val ev = t(s, d, "events").select(col("event_id"), col("ts"))
        val rng = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        val folds = s.range(1, K).select(col("id").as("k"))
        ev.crossJoin(broadcast(rng))
          .withColumn("fold",
            least(expr(s"(ts - lo) * $K div (hi - lo)"), lit(K - 1)))
          .crossJoin(broadcast(folds))
          .withColumn("fold_start",
            expr(s"lo + (hi - lo) * k div $K"))
          .withColumn("cls",
            when(col("fold") === col("k"), "test")
              .when(col("fold") < col("k") &&
                col("ts") < col("fold_start") - EmbargoUs, "train")
              .when(col("fold") < col("k"), "embargo"))
          .filter(col("cls").isNotNull)
          .groupBy("k")
          .agg(
            sum(when(col("cls") === "train", 1L).otherwise(0L))
              .as("n_train"),
            sum(when(col("cls") === "embargo", 1L).otherwise(0L))
              .as("n_embargo"),
            sum(when(col("cls") === "test", 1L).otherwise(0L))
              .as("n_test"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id, epoch_us(ts) AS ts FROM events),
        rng AS (
          SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM ev),
        f AS (
          SELECT ev.event_id, ev.ts,
            least((ev.ts - rng.lo) * 5 // (rng.hi - rng.lo), 4) AS fold,
            rng.lo, rng.hi
          FROM ev, rng),
        x AS (
          SELECT f.*, k.k,
            f.lo + (f.hi - f.lo) * k.k // 5 AS fold_start
          FROM f, (SELECT unnest(range(1, 5)) AS k) k),
        c AS (
          SELECT k,
            CASE
              WHEN fold = k THEN 'test'
              WHEN fold < k AND ts < fold_start - 86400000000
                THEN 'train'
              WHEN fold < k THEN 'embargo'
            END AS cls
          FROM x)
        SELECT k,
          CAST(SUM(CASE WHEN cls = 'train' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_train,
          CAST(SUM(CASE WHEN cls = 'embargo' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_embargo,
          CAST(SUM(CASE WHEN cls = 'test' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_test
        FROM c WHERE cls IS NOT NULL GROUP BY k""")),

    // ---- q256: mixture entropy — how diverse is the training mix?
    //      The q114 integer-log2 entropy surrogate applied to SOURCE
    //      shares (by token volume, the unit mixing actually budgets):
    //      H = Σ n_s·(⌊log2 N⌋ − ⌊log2 n_s⌋) exact bigints, plus the
    //      max-share concentration the entropy alone can hide. A
    //      one-row diversity gate for q94/q95's mixing policies —
    //      cheap enough to run on every mix revision. ----
    QueryDef(
      "q256_mix_entropy",
      (s, d) => {
        val per = t(s, d, "documents")
          .select(col("source"),
            size(graft.functions.TextFunctions.tokens(col("text")))
              .cast("long").as("toks"))
          .groupBy("source")
          .agg(sum(col("toks")).as("n_s"))
        val bits = (c: Column) => (length(bin(c)) - 1).cast("long")
        per.agg(count(lit(1)).as("n_sources"),
            sum(col("n_s")).as("n_total"),
            max(col("n_s")).as("max_s"))
          .crossJoin(broadcast(per.select(col("n_s"))
            .agg(collect_list(col("n_s")).as("all_s"))))
          .select(col("n_sources"), col("n_total"), col("max_s"),
            aggregate(col("all_s"), lit(0L),
              (acc, v) => acc + v * (bits(col("n_total")) - bits(v)))
              .as("h_bits"),
            expr("max_s * 1000000 div n_total").as("max_share_ppm"))
          .withColumn("mean_millibits",
            expr("h_bits * 1000 div n_total"))
      },
      Some("""
        WITH per AS (
          SELECT source,
            CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS n_s
          FROM documents GROUP BY 1),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
            CAST(SUM(n_s) AS BIGINT) AS n_total,
            CAST(MAX(n_s) AS BIGINT) AS max_s
          FROM per)
        SELECT n_sources, n_total, max_s,
          (SELECT CAST(SUM(n_s * ((length(bin(n_total)) - 1)
             - (length(bin(n_s)) - 1))) AS BIGINT) FROM per)
            AS h_bits,
          max_s * 1000000 // n_total AS max_share_ppm,
          (SELECT CAST(SUM(n_s * ((length(bin(n_total)) - 1)
             - (length(bin(n_s)) - 1))) AS BIGINT) FROM per)
            * 1000 // n_total AS mean_millibits
        FROM tot""")),

    // ---- q280: data-constrained epoch allocation — when the token
    //      budget exceeds the corpus, WHICH sources repeat and how
    //      often? Following the data-constrained-scaling intuition
    //      that repeated epochs have diminishing value (Muennighoff
    //      et al. 2023: ~zero marginal value past a few repeats,
    //      modeled here as gain halving per epoch), the allocator
    //      fans each source into epoch slots 1..8 with EXACT integer
    //      gain tok·2^(8−e) and greedily takes the top-30 slots
    //      (TakeOrdered over the ≤ sources×8 lattice — never a
    //      window), then reports epochs granted + effective tokens
    //      per source. Deterministic ties (gain, source, epoch). ----
    QueryDef(
      "q280_epoch_allocation",
      (s, d) => {
        val budget = 30
        val tok = t(s, d, "documents")
          .select(col("source"), rawTokens(col("text")).as("toks"))
          .groupBy("source")
          .agg(sum(size(col("toks"))).cast("long").as("tok"))
        val lattice = tok
          .withColumn("epoch", explode(array((1 to 8).map(e =>
            lit(e.toLong)): _*)))
          .withColumn("gain",
            col("tok") * expr("shiftleft(1, cast(8 - epoch as int))"))
        val granted = lattice
          .orderBy(col("gain").desc, col("source"), col("epoch"))
          .limit(budget)
        granted.groupBy("source")
          .agg(count(lit(1)).as("epochs"),
            max(col("tok")).as("tok"),
            sum(col("gain")).as("gain_total"))
          .withColumn("effective_tokens", col("tok") * col("epochs"))
      },
      Some("""
        WITH tok AS (
          SELECT source,
            CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS tok
          FROM documents GROUP BY 1),
        lattice AS (
          SELECT source, tok, CAST(e AS BIGINT) AS epoch,
            tok * (1 << (8 - e)) AS gain
          FROM tok, unnest([1, 2, 3, 4, 5, 6, 7, 8]) u(e)),
        granted AS (
          SELECT * FROM lattice
          ORDER BY gain DESC, source, epoch LIMIT 30)
        SELECT source, COUNT(*) AS epochs, MAX(tok) AS tok,
          CAST(SUM(gain) AS BIGINT) AS gain_total,
          MAX(tok) * COUNT(*) AS effective_tokens
        FROM granted GROUP BY 1""")),

    // ---- q299: variance-proportional stratified allocation with
    //      exact largest-remainder rounding — the Neyman-style sample
    //      design step: given a 10,000-row budget, how many samples
    //      does each stratum (event_type) get if allocation is
    //      proportional to its spread? Weights are the exact integer
    //      variance numerators n_h·Σx² − (Σx)² (cents), quantized by
    //      a shared 2^20 divisor so 10000·w stays in int64 (the
    //      quantization is part of the stated semantics — both
    //      engines apply it identically, so allocation is
    //      deterministic). Floor division allocates, and the
    //      leftover 10000 − Σfloor goes to the largest remainders —
    //      ranked WITHOUT an unpartitioned window via the bounded
    //      collect idiom (q106: ≤|strata| rows, sort_array,
    //      posexplode). Every output column is an exact integer. ----
    QueryDef(
      "q299_neyman_allocation",
      (s, d) => {
        val g = t(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_h"), sum(col("x")).as("s1"),
            sum(expr("x * x")).as("s2"))
          .withColumn("w", expr("(n_h * s2 - s1 * s1) div 1048576"))
        val tot = g.agg(sum(col("w")).as("bigw")).filter(col("bigw") > 0)
        val alloc = g.crossJoin(broadcast(tot))
          .withColumn("n_floor", expr("(10000 * w) div bigw"))
          .withColumn("rem", expr("(10000 * w) % bigw"))
        val ranked = alloc
          .agg(collect_list(struct((-col("rem")).as("nr"),
            col("event_type"))).as("l"),
            sum(col("n_floor")).as("fsum"))
          .select(col("fsum"), posexplode(sort_array(col("l"))))
          .select(col("col.event_type").as("event_type"),
            (col("pos") + 1).cast("long").as("rk"), col("fsum"))
        alloc.join(ranked, Seq("event_type"))
          .select(col("event_type"), col("n_h"), col("w"),
            col("n_floor"), col("rem"),
            (col("n_floor") + when(col("rk") <= lit(10000L) - col("fsum"),
              1L).otherwise(0L)).as("n_alloc"))
      },
      Some("""
        WITH e AS (
          SELECT event_type,
            CAST(floor("value" * 100) AS BIGINT) AS x
          FROM events WHERE "value" IS NOT NULL),
        g AS (
          SELECT event_type, COUNT(*) AS n_h,
            CAST(SUM(x) AS BIGINT) AS s1,
            CAST(SUM(x * x) AS BIGINT) AS s2
          FROM e GROUP BY 1),
        w AS (
          SELECT *, (n_h * s2 - s1 * s1) // 1048576 AS w FROM g),
        t AS (SELECT CAST(SUM(w) AS BIGINT) AS bigw FROM w),
        a AS (
          SELECT w.*, (10000 * w) // bigw AS n_floor,
            (10000 * w) % bigw AS rem
          FROM w, t WHERE bigw > 0),
        r AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, event_type)
              AS rk,
            CAST(SUM(n_floor) OVER () AS BIGINT) AS fsum
          FROM a)
        SELECT event_type, n_h, w, n_floor, rem,
          n_floor + CASE WHEN rk <= 10000 - fsum THEN 1 ELSE 0 END
            AS n_alloc
        FROM r""")),

    // ---- q333: systematic PPS sampling (probability proportional to
    //      size, Madow 1949) — the DETERMINISTIC weighted sampler the
    //      mixing stack lacked: q53's hash split is uniform, q63/q299
    //      stratify by group; here heavy items must be MORE likely in
    //      the sample (cost-weighted eval sets, spend-weighted audit
    //      pulls). Lay every order's weight (price cents) end to end
    //      under the o_orderkey total order and take n=500 evenly
    //      spaced sample points: item hit count = ⌊cum·n/W⌋ −
    //      ⌊(cum−w)·n/W⌋ — pure integer floor division, zero floats,
    //      items heavier than W/n get multiple hits (the textbook
    //      PPS-with-certainty behavior). Phase 0, so the whole draw
    //      is reproducible cross-engine — hash equality IS the proof.
    //
    //      Scale shape: the global cumulative rides ONE PrefixScan
    //      banded pass (no unpartitioned window); the total is a
    //      one-row broadcast; selection is per-row arithmetic.
    //      Magnitudes: cum·n ≤ ~1e13 at sf0.1 — int64-safe through
    //      sf100. ----
    QueryDef(
      "q333_pps_systematic",
      (s, d) => {
        val n = 500L
        // conditional spread by o_orderkey off the single-task scan
        // (guide §2.5): both PrefixScan passes over the cache (the
        // percentile cut aggregate and the banded window input)
        // previously ran single-core off the scan's one frozen
        // partition; no-op on a many-file table (the gate).
        val w = graft.operators.InputSpread.byKey(
            t(s, d, "orders")
              .select(col("o_orderkey"),
                round(col("o_totalprice") * 100).cast("long").as("w_cents")),
            col("o_orderkey"))
          .persist() // PrefixScan reads it twice (cuts + scan)
        val cum = graft.operators.PrefixScan.runningSums(
          w, "o_orderkey", Seq.empty, Seq("w_cents" -> "cum_cents"))
        val tot = w.agg(sum(col("w_cents")).as("big_w"))
        cum.crossJoin(broadcast(tot))
          .withColumn("n_hits",
            expr(s"(cum_cents * $n) div big_w") -
              expr(s"((cum_cents - w_cents) * $n) div big_w"))
          .filter(col("n_hits") > 0)
          .select(col("o_orderkey"), col("w_cents"), col("cum_cents"),
            col("n_hits"))
      },
      Some("""
        WITH w AS (
          SELECT o_orderkey,
            CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents
          FROM orders),
        c AS (
          SELECT o_orderkey, w_cents,
            CAST(SUM(w_cents) OVER (ORDER BY o_orderkey
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
          FROM w),
        t AS (SELECT CAST(SUM(w_cents) AS BIGINT) AS big_w FROM w)
        SELECT o_orderkey, w_cents, cum_cents,
          (cum_cents * 500) // big_w
            - ((cum_cents - w_cents) * 500) // big_w AS n_hits
        FROM c, t
        WHERE (cum_cents * 500) // big_w
            - ((cum_cents - w_cents) * 500) // big_w > 0""")),
  )
}
