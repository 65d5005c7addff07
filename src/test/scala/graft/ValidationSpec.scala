package graft

import org.apache.spark.sql.functions._

import graft.queries.Validation

/** Validation pack: plan shape (dims broadcast, fact-sized parent
  * shuffles, no distinct-EXPAND blowup), planted-orphan detection, and
  * the z-order locality property the layout key exists for.
  */
class ValidationSpec extends SparkTestBase {

  test("morton interleave puts x on even bits, y on odd bits") {
    import spark.implicits._
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(Validation.morton(col("x"), col("y"), 10).as("z"))
      .collect()(0).getLong(0)
    // x=101b → bits 0,4; y=011b → bits 1,3 ⇒ 1+2+8+16
    assert(r === 27L)
  }

  test("q130 plan: dim parents broadcast, orders parent shuffles") {
    // the contract is about HINTS, not the tiny-SF physical choice:
    // exactly the three bounded dims are force-broadcast; the
    // fact-sized orders parent carries NO hint, so its strategy stays
    // a stats decision (broadcast at sf0.001, shuffle join at 100 TB —
    // a static hint there would OOM the large-scale plan).
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = SparkEntry.queries("q130_fk_audit")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 4, s"expected 4 FK joins, got ${joins.size}")
    val hinted = joins.count(j =>
      j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined))
    assert(hinted === 3,
      s"exactly the 3 dim parents must carry a broadcast hint, got $hinted")
    // and the query still executes to the expected 4 audit rows
    assert(df.count() === 4L)
  }

  test("q130: planted orphans are found in every relation") {
    val rows = SparkEntry.queries("q130_fk_audit")(spark, sf).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") > 0L,
        s"${r.getAs[String]("relation")}: planting produced no orphans")
      assert(r.getAs[Long]("n_orphan_keys") <= r.getAs[Long]("n_orphans"))
      assert(r.getAs[Long]("n_orphans") <= r.getAs[Long]("n_rows"))
    }
  }

  test("q131 profile: no distinct-EXPAND blowup, sane bounds") {
    val df = SparkEntry.queries("q131_column_profile")(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    // each column is its own single-distinct scan — the multi-distinct
    // EXPAND multiplier (rows × #aggregates) must never appear
    assert(!p.contains("Expand"), s"profile plan EXPANDs the scan:\n$p")
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("column")).toSet.size === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nulls") === 0L)
      assert(r.getAs[Long]("n_distinct") > 0L)
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
  }

  test("q132 expectations: violating and passing rules both honest") {
    val rows = SparkEntry.queries("q132_expectations")(spark, sf).collect()
      .map(r => r.getAs[String]("rule") -> r).toMap
    // thresholds sit inside the data's natural ranges → real violations
    assert(rows("lineitem.quantity<=30").getAs[Long]("n_violations") > 0L)
    assert(rows("orders.status_in_OF").getAs[Long]("n_violations") > 0L)
    // a clean rule reports zero, not noise
    assert(rows("lineitem.extendedprice>0").getAs[Long]("n_violations") === 0L)
    rows.values.foreach { r =>
      val rate = r.getAs[Double]("violation_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_checked"))
    }
  }

  test("q134 reconcile: all four diff classes populated, keys conserved") {
    val rows = SparkEntry.queries("q134_reconcile")(spark, sf).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_keys")).toMap
    assert(rows.keySet === Set(
      "equal", "value_mismatch", "missing_in_replica", "extra_in_replica"))
    rows.values.foreach(n => assert(n > 0L))
    // conservation: base keys = equal + mismatch + missing
    val nBase = graft.core.Tables.t(spark, sf, "orders").count()
    assert(rows("equal") + rows("value_mismatch") +
      rows("missing_in_replica") === nBase)
    // drift keys (% 103, surviving the % 101 drop) are mismatches, not
    // equals — the decimal compare is load-bearing
    assert(rows("value_mismatch") > 0L)
  }

  test("q135 histogram: bins tile the domain, densities sum to 1") {
    val rows = SparkEntry.queries("q135_histogram")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 32)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(math.abs(rows.map(_.getAs[Double]("density")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      // observed per-bin bounds stay inside the bin's share of the
      // domain ordering: min <= max, and bins don't overlap in cents
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents"))
    }
    val sorted = rows.sortBy(_.getAs[Long]("bin"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_cents") < b.getAs[Long]("min_cents"),
          "bins overlap in value space")
      case _ =>
    }
    assert(total === graft.core.Tables.t(spark, sf, "lineitem").count())
  }

  test("KMV aggregator: partition-order invariant, equals sorted-take") {
    import spark.implicits._
    val df = graft.core.Tables.t(spark, sf, "documents")
      .select(col("lang"), explode(array_distinct(
        graft.functions.TextFunctions.tokens(lower(col("text"))))).as("tok"))
      .select(col("lang"), md5(col("tok")).as("h"))
    def sketch(part: Int): Map[String, Seq[String]] =
      df.repartition(part)
        .groupBy("lang")
        .agg(graft.functions.KmvSketch.kmvMinHex(col("h"), 5).as("mins"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // merge is associative+commutative → identical under any partitioning
    val a = sketch(2); val b = sketch(7)
    assert(a === b)
    // and equal to the exact 5 smallest distinct hashes per group
    val exact = df.distinct().as[(String, String)].collect()
      .groupBy(_._1).map { case (l, xs) =>
        l -> xs.map(_._2).distinct.sorted.take(5).toSeq
      }
    assert(a === exact)
  }

  test("q136: estimate derives from the 5th minimum, ranks complete") {
    val rows = SparkEntry.queries("q136_kmv_sketch")(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // one estimate per group, positive, and ≥ k (can't estimate
      // fewer distincts than the sketch holds)
      val ests = rs.map(_.getAs[Double]("est_distinct")).distinct
      assert(ests.length === 1 && ests.head >= 5.0)
      // hashes ascend with rank (the sketch IS the k minimums, sorted)
      val hs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[String]("h"))
      assert(hs.sorted.sameElements(hs))
    }
  }

  test("q137 skew profile: ranks complete, shares bounded, ratio >= 1") {
    val df = SparkEntry.queries("q137_skew_profile")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString()
    assert(p.contains("TakeOrderedAndProject"),
      s"heavy-hitter cut must be TakeOrdered, not a global sort:\n$p")
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ===
      (1L to rows.length).toSeq)
    val shares = rows.sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Double]("share"))
    assert(shares.sum <= 1.0 + 1e-9)
    assert(shares.sameElements(shares.sortBy(-_)), "shares must descend")
    rows.foreach { r =>
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-9,
        "max/mean cannot be below 1")
    }
  }

  test("q133 z-order: every bucket is a tight rectangle in BOTH dims") {
    val rows = SparkEntry.queries("q133_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // top-6-bit z-buckets = 128×128 quadrants by construction
      assert(r.getAs[Long]("max_gx") - r.getAs[Long]("min_gx") <= 127L,
        s"bucket ${r.getAs[Long]("bucket")} leaks in gx: $r")
      assert(r.getAs[Long]("max_gy") - r.getAs[Long]("min_gy") <= 127L,
        s"bucket ${r.getAs[Long]("bucket")} leaks in gy: $r")
    }
    // contrast: a 1-D sort key cannot bound the second dimension — the
    // same grid bucketed by gx alone spans (almost) the full gy domain,
    // so the interleave is load-bearing, not decoration
    val li = graft.core.Tables.t(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val dom = li.agg(max(col("l_partkey")).as("max_pk"),
      max(col("l_suppkey")).as("max_sk"))
    val oneD = li.crossJoin(broadcast(dom))
      .select(expr("l_partkey * 1024L div (max_pk + 1L)").as("gx"),
        expr("l_suppkey * 1024L div (max_sk + 1L)").as("gy"))
      .groupBy(expr("gx div 128").as("bucket"))
      .agg((max(col("gy")) - min(col("gy"))).as("gy_span"))
      .agg(max(col("gy_span"))).collect()(0).getLong(0)
    assert(oneD > 512L,
      s"fixture too degenerate to demonstrate z-order locality: $oneD")
  }
}
