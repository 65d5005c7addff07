package graft

/** Plan-quality asserts for the round-10 queries (q154–q167): the
  * shapes the scale story depends on — broadcasts where intended, no
  * accidental products, pruned scans, map-only codec stages.
  */
class Round10PlanSpec extends SparkTestBase {

  private def settled(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // settle AQE so the final adaptive plan is inspected
    df.queryExecution.executedPlan.toString()
  }

  test("q154/q155: totals broadcast, no cartesian degeneration") {
    for (q <- Seq("q154_distinctive_terms", "q155_pmi_bigrams")) {
      val p = settled(q)
      assert(!p.contains("CartesianProduct"), s"$q product:\n$p")
      // the one-row scalar attaches must be broadcast, not shuffled
      assert(p.contains("BroadcastExchange") ||
        p.contains("BroadcastNestedLoopJoin"), s"$q lost its broadcast:\n$p")
    }
  }

  test("q157/q162: posting joins stay equi-joins, never products") {
    for (q <- Seq("q157_sparse_topk", "q162_doc_triangles")) {
      val p = settled(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must candidate-generate by equi-join only:\n$p")
    }
  }

  test("q158/q159 codec stages are map-only: zero exchanges") {
    for (q <- Seq("q158_png_roundtrip", "q159_wav_roundtrip")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange"), s"$q decode shuffles:\n$p")
      assert(!p.contains("Sort"), s"$q decode sorts:\n$p")
    }
  }

  test("q160/q161/q163/q164: windows keyed, totals broadcast") {
    for (q <- Seq("q160_event_transitions", "q161_cusum_changepoint",
        "q163_scd2_intervals", "q164_max_concurrency")) {
      val p = settled(q)
      assert(p.contains("Window"), s"$q lost its window:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q product:\n$p")
    }
    // the two broadcast-totals queries must actually broadcast
    for (q <- Seq("q160_event_transitions", "q161_cusum_changepoint"))
      assert(settled(q).contains("BroadcastExchange"),
        s"$q totals must broadcast, not shuffle")
  }

  test("q166: scan prunes to (vec_id, embedding), self-join is keyed") {
    val p = settled("q166_embedding_cov")
    assert(p.contains(
      "ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      s"q166 scan reads unneeded columns:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q166 dim-pair join degenerated:\n$p")
  }

  test("q165/q167: selection/closure results join back without products") {
    for (q <- Seq("q165_equidepth_hist", "q167_tree_rollup")) {
      val p = settled(q)
      assert(!p.contains("CartesianProduct"), s"$q product:\n$p")
    }
  }

  test("q199/q202: tiny stat tables broadcast back over the fact scan") {
    for (q <- Seq("q199_impute_median", "q202_quartile_fences")) {
      val p = settled(q)
      assert(p.contains("BroadcastExchange") ||
        p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q product:\n$p")
    }
  }

  test("q200: bounded fold fan-out rides broadcasts, never a shuffle product") {
    val p = settled("q200_purged_split")
    // the one-row range and the 4-row fold table attach via broadcast
    // nested-loop (bounded ×K); a shuffled CartesianProduct would mean
    // the fact side got replicated through an exchange
    assert(p.contains("BroadcastNestedLoopJoin"), s"q200:\n$p")
    assert(!p.contains("CartesianProduct"), s"q200 product:\n$p")
  }

  /** Adaptive plans print Final and Initial sections — count operators
    * in the FINAL (executed) section only. */
  private def finalSection(p: String): String =
    p.split("== Initial Plan ==").head

  test("q203: one user-keyed exchange serves all three window stages") {
    val p = finalSection(settled("q203_monotone_runs"))
    val exchanges =
      "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"q203 expected ONE keyed exchange (windows + aggregates all " +
        s"cluster by user_id), got $exchanges:\n$p")
  }

  test("q204/q206: stacked windows share one keyed exchange") {
    // q204's bounded-frame window keys by type; q206's two windows key
    // by brand and (brand, price) — hash(brand) satisfies both, so a
    // second exchange would be a planner regression
    for (q <- Seq("q204_rolling_median", "q206_pareto_frontier")) {
      val p = finalSection(settled(q))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1, s"$q expected one keyed exchange, " +
        s"got $exchanges:\n$p")
    }
  }

  test("q205: promo calendar broadcasts; no shuffled product") {
    val p = finalSection(settled("q205_interval_overlap"))
    assert(p.contains("BroadcastExchange"), s"q205 lost broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"q205 product:\n$p")
  }

  test("q207: quintile cuts broadcast; q208: one entity-keyed exchange") {
    val p207 = finalSection(settled("q207_rfm_segments"))
    assert(p207.contains("BroadcastExchange") ||
      p207.contains("BroadcastNestedLoopJoin"),
      s"q207 cut row must broadcast:\n$p207")
    assert(!p207.contains("CartesianProduct"), s"q207 product:\n$p207")
    val p208 = finalSection(settled("q208_golden_record"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p208).size
    assert(exchanges == 1,
      s"q208 survivorship windows + aggregate must share one " +
        s"user-keyed exchange, got $exchanges:\n$p208")
  }

  test("q216/q227/q232: candidate generation stays equi-join only") {
    for (q <- Seq("q216_minhash_calibration", "q227_session_incidents",
        "q232_dedup_coverage")) {
      val p = finalSection(settled(q))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q grew a pair scan:\n$p")
    }
  }

  test("q231: compaction costs exactly one entity-keyed exchange") {
    val p = finalSection(settled("q231_cdc_compaction"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"q231 expected one keyed exchange, got $exchanges:\n$p")
  }

  test("q237/q244/q246/q247: pair generation stays equi-join only") {
    for (q <- Seq("q237_audience_overlap", "q244_negative_sampling",
        "q246_correlogram", "q247_theilsen_trend")) {
      val p = finalSection(settled(q))
      assert(!p.contains("CartesianProduct"), s"$q product:\n$p")
    }
  }

  test("q233: factored power steps stay product-free (S never built)") {
    val p = finalSection(settled("q233_power_iteration"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q233 power step degenerated:\n$p")
  }

  test("q198: per-order windows reuse one order-keyed exchange") {
    val p = finalSection(settled("q198_prorate_allocation"))
    assert(!p.contains("CartesianProduct"), s"q198 product:\n$p")
    // windows and the remainder rank all partition by l_orderkey: after
    // the join's exchange, no additional repartitioning may appear
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, // one per join side at most
      s"q198 window stages must reuse the join partitioning, " +
        s"got $exchanges exchanges:\n$p")
  }

  test("q261: both prefix windows + aggregate share ONE user exchange") {
    val p = finalSection(settled("q261_clamped_balance"))
    assert(!p.contains("CartesianProduct"), s"q261 product:\n$p")
    // prefix-sum window, running-min window, row_number window, the
    // per-user aggregate AND the final self-join all cluster by
    // user_id: exactly one hash exchange may appear
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"q261 expected ONE user_id exchange reused across windows + " +
        s"aggregate + join, got $exchanges:\n$p")
  }

  test("q63: rank<=k filter collapses to a window group limit") {
    // the stratified sample must NOT materialize a full per-stratum
    // sort of every row's rank — Spark's InferWindowGroupLimit turns
    // the row_number<=k filter into a per-partition bounded top-k
    val p = settled("q63_stratified_sample")
    assert(p.contains("WindowGroupLimit"),
      s"q63 lost the group-limit rewrite (full rank materialized):\n$p")
  }

  test("q267: quartile boundaries broadcast back over the day domain") {
    val p = finalSection(settled("q267_quartile_motifs"))
    assert(p.contains("BroadcastExchange"),
      s"q267 must broadcast the per-type quartiles:\n$p")
    assert(!p.contains("CartesianProduct"), s"q267 product:\n$p")
  }

  test("q270: single combinable aggregate, no product") {
    val p = finalSection(settled("q270_wilson_ranking"))
    assert(!p.contains("CartesianProduct"), s"q270 product:\n$p")
    assert(p.contains("HashAggregate"), s"q270 lost its aggregate:\n$p")
  }

  test("q271: the ABC prefix scan windows by band, cuts broadcast") {
    val p = finalSection(settled("q271_abc_classification"))
    // under a warm cache the one-row attaches print as BNLJ over an
    // InMemoryRelation without a literal BroadcastExchange node
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"q271 must broadcast the band cuts + total:\n$p")
    assert(!p.contains("CartesianProduct"), s"q271 product:\n$p")
  }

  test("q272: duplicate-pair generation is a pure equi-join") {
    val p = finalSection(settled("q272_double_charge"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q272 degenerated to an inequality join:\n$p")
  }

  test("q273: per-nation totals broadcast back over supplier revenue") {
    val p = finalSection(settled("q273_hhi_concentration"))
    assert(p.contains("BroadcastExchange"), s"q273 lost broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"q273 product:\n$p")
  }

  test("q274: one user-keyed exchange; coalition lattice rides broadcasts") {
    val p = finalSection(settled("q274_shapley_attribution"))
    // the only hash exchanges may serve the user-mask aggregate and
    // the tiny mask/coalition groupings — no sort-merge join anywhere
    assert(!p.contains("SortMergeJoin"),
      s"q274 shuffled a 16-row lattice:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), s"q274 lost broadcast:\n$p")
  }

  test("q275: the 9-point grid broadcasts; the rank window is keyed") {
    val p = finalSection(settled("q275_bitemporal_asof"))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), s"q275 lost broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q275 shuffled the grid:\n$p")
  }
}
