package graft

/** Planted-structure semantics for the round-10 second-half queries —
  * the oracle hash says Spark == DuckDB; these say both == the
  * intended algorithm, via properties the synthesis guarantees.
  */
class Round10SemanticsSpec extends SparkTestBase {

  private def run(q: String) =
    SparkEntry.queries(q)(spark, SharedSpark.Sf001)

  test("q211: precedence — every case-mangled record resolves by rule 1") {
    // (dirty_id div 6) % 3 == 0 rows are upper-cased exact copies:
    // rules 2 and 3 also fire on them, but lowest-rule-wins must
    // report rule 1
    val rows = run("q211_entity_resolution")
      .select("dirty_id", "rule").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val caseMangled = rows.filter(r => (r._1 / 6) % 3 == 0)
    assert(caseMangled.nonEmpty)
    assert(caseMangled.forall(_._2 == 1L),
      s"case-mangled rows must win at rule 1: ${caseMangled.take(5).toSeq}")
    // reorder class can never match rules 1/2 unless the reorder is
    // an identity — so anything it reports is rule 3 or a legitimate
    // earlier-rule identity case; assert rule 3 dominates
    val reorders = rows.filter(r => (r._1 / 6) % 3 == 2)
    assert(reorders.count(_._2 == 3L) > reorders.length / 2)
  }

  test("q232: detector coverage matches dedup theory on planted kinds") {
    val m = run("q232_dedup_coverage").collect()
      .map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("caught_exact"),
          r.getAs[Long]("caught_tsort"), r.getAs[Long]("caught_simhash3")))
      .toMap
    // exact copies: every detector catches every pair
    val (nE, eE, tE, sE) = m("exact_copy")
    assert(eE == nE && tE == nE && sE == nE)
    // reorders: token-sort and simhash catch ALL (token multiset is
    // unchanged); exact md5 misses any non-identity reorder
    val (nR, eR, tR, sR) = m("reorder")
    assert(tR == nR && sR == nR)
    assert(eR < nR, "exact fp should miss most reorders")
    // char drops: exact misses all non-identity drops; simhash (one
    // token perturbed) catches more than token-sort (which needs the
    // whole sorted token string to match)
    val (nC, eC, tC, sC) = m("char_drop")
    assert(eC < nC && sC >= tC)
  }

  test("q220: survival curve is monotone and censoring-consistent") {
    val rows = run("q220_conversion_survival").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_signups"),
        r.getAs[Long]("n_converted_by_k"), r.getAs[Long]("n_pending")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 13L).toSeq)
    // same signup population at every horizon; pending = complement
    assert(rows.map(_._2).distinct.length == 1)
    assert(rows.forall { case (_, n, c, p) => c + p == n })
    // converted-by-k never decreases with k
    assert(rows.map(_._3).sliding(2).forall {
      case Array(a, b) => b >= a
      case _ => true
    })
  }

  test("q213: reported gaps exactly reconstruct the planted deletions") {
    // ids removed are event_id % 97 == 0 — the union of reported
    // [gap_start, gap_end] ranges must be exactly those ids (within
    // the observed id range, excluding domain edges)
    val gaps = run("q213_id_gap_ranges").collect()
      .flatMap(r => r.getAs[Long]("gap_start") to r.getAs[Long]("gap_end"))
      .toSet
    val all = graft.core.Tables.t(spark, SharedSpark.Sf001, "events")
      .select("event_id").collect().map(_.getLong(0)).toSet
    // recompute at the same SF the spec reads
    val tiny = SparkEntry.queries("q213_id_gap_ranges")(
      spark, SharedSpark.Sf0001).collect()
      .flatMap(r => r.getAs[Long]("gap_start") to r.getAs[Long]("gap_end"))
      .toSet
    val ids0 = graft.core.Tables.t(spark, SharedSpark.Sf0001, "events")
      .select("event_id").collect().map(_.getLong(0))
      .filter(_ % 97 != 0).toSet
    val expected = (ids0.min to ids0.max).toSet -- ids0
    assert(tiny == expected, s"gap union mismatch: ${
      (tiny diff expected).take(5)} / ${(expected diff tiny).take(5)}")
    // sf0.01: every reported gap id is one of the planted deletions
    assert(gaps.nonEmpty && gaps.forall(_ % 97 == 0))
    assert(all.intersect(gaps).forall(_ % 97 == 0))
  }

  test("q198: allocations reconcile exactly to each order total") {
    val ok = SparkEntry.queries("q198_prorate_allocation")(
        spark, SharedSpark.Sf0001)
      .groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.sum("alloc_cents").as("s"))
    val orders = graft.core.Tables.t(spark, SharedSpark.Sf0001, "orders")
      .selectExpr("o_orderkey as l_orderkey",
        "cast(round(o_totalprice * 100) as long) as tot")
    val bad = ok.join(orders, Seq("l_orderkey"))
      .filter(org.apache.spark.sql.functions.col("s") =!=
        org.apache.spark.sql.functions.col("tot"))
      .count()
    assert(bad == 0L, s"$bad orders failed exact reconciliation")
  }
}
