package graft

import org.apache.spark.sql.functions._

import graft.plans.IntervalJoinRule

/** The interval-join optimizer rule must turn the naive inequality
  * overlap join into a binned equi-join (no nested loop / cartesian in
  * the physical plan) while returning EXACTLY the naive join's rows —
  * including duplicate-row multiplicity, which the first-shared-bin
  * emission preserves without a Distinct.
  */
class IntervalJoinRuleSpec extends SparkTestBase {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRule(spark)
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[IntervalJoinRule])
  }

  test("rewrites the inequality join to a binned equi-join, same rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate rows included: multiplicity must survive the rewrite
    val aRows = (1 to 300).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong % 250, s, s + 1 + rnd.nextInt(300))
    }
    val bRows = (1 to 200).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong % 150, s, s + 1 + rnd.nextInt(200))
    }
    val a = aRows.toDF("a_id", "a_s", "a_e")
    val b = bRows.toDF("b_id", "b_s", "b_e")
    val cond = col("a_s") < col("b_e") && col("b_s") < col("a_e")

    val naive = a.join(b, cond).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(identity).view.mapValues(_.size).toMap

    val prevBin = spark.conf.getOption("spark.graft.intervalJoin.binUs")
    spark.conf.set("spark.graft.intervalJoin.binUs", "128")
    try withRule {
      val joined = a.join(b, cond)
      val plan = formattedPlan(joined)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"rule did not rewrite the join:\n$plan")
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got === naive)
    } finally prevBin match {
      case Some(v) => spark.conf.set("spark.graft.intervalJoin.binUs", v)
      case None => spark.conf.unset("spark.graft.intervalJoin.binUs")
    }
  }

  test("degenerate (e <= s) rows keep the NAIVE condition's semantics") {
    // the two-conjunct form a_s < b_e AND b_s < a_e is true for some
    // empty intervals (it only equals max<min given s<e) — the rewrite
    // must reproduce the condition AS WRITTEN, not "fix" it, and the
    // clamped bin sequence must not throw on the descending bounds
    import spark.implicits._
    val a = Seq((1L, 10L, 20L), (2L, 30L, 30L), (3L, 50L, 40L))
      .toDF("a_id", "a_s", "a_e") // rows 2,3: e <= s
    val b = Seq((9L, 0L, 100L)).toDF("b_id", "b_s", "b_e")
    val cond = col("a_s") < col("b_e") && col("b_s") < col("a_e")
    val naive = a.join(b, cond).select("a_id").collect()
      .map(_.getLong(0)).toSet
    val prevBin = spark.conf.getOption("spark.graft.intervalJoin.binUs")
    spark.conf.set("spark.graft.intervalJoin.binUs", "16")
    try withRule {
      val got = a.join(b, cond).select("a_id").collect().map(_.getLong(0))
      assert(got.toSet === naive)
      assert(naive === Set(1L, 2L, 3L)) // the condition really is true
    } finally prevBin match {
      case Some(v) => spark.conf.set("spark.graft.intervalJoin.binUs", v)
      case None => spark.conf.unset("spark.graft.intervalJoin.binUs")
    }
  }

  test("q347's cum-axis FIFO join: a skewed user triggers the binning " +
      "rule verbatim (bin joins the keys; allocations unchanged)") {
    // The q347 scale claim (queries/Temporal.scala): heavy keys can
    // use IntervalJoinRule on the CUMULATIVE axis. Prove it: one hot
    // user holds nearly all lots, the FIFO overlap join is written
    // with materialized [cum−amt, cum) long attributes, and with the
    // rule on, the user-equality join gains the bin as a SECOND
    // equi-key — the hot user's quadratic per-key pair space splits
    // across cum-axis bins — while every allocation stays identical.
    import spark.implicits._
    val rnd = new scala.util.Random(347)
    def lots(n: Int, hot: Int) = (1 to n).map { i =>
      val user = if (i <= hot) 1L else (i % 7 + 2).toLong
      (user, i.toLong, 1L + rnd.nextInt(500))
    }
    def cumAxis(rows: Seq[(Long, Long, Long)], id: String, amt: String,
        st: String, en: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(id)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      rows.toDF("user_id", id, amt)
        .withColumn(en, sum(col(amt)).over(w))
        .withColumn(st, col(en) - col(amt))
    }
    val sup = cumAxis(lots(400, 360), "supply_id", "s_amt", "st_s", "en_s")
    val dem = cumAxis(lots(300, 270), "demand_id", "d_amt", "st_d", "en_d")
    val cond = col("user_id") === col("d_user") &&
      col("st_s") < col("en_d") && col("st_d") < col("en_s")
    val demR = dem.withColumnRenamed("user_id", "d_user")
    def alloc(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("supply_id"), col("demand_id"),
        (least(col("en_s"), col("en_d")) -
          greatest(col("st_s"), col("st_d"))).as("cents"))
      .filter(col("cents") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val naive = alloc(sup.join(demR, cond))
    val prevBin = spark.conf.getOption("spark.graft.intervalJoin.binUs")
    spark.conf.set("spark.graft.intervalJoin.binUs", "1024")
    try withRule {
      val joined = sup.join(demR, cond)
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bin"),
        s"rule did not fire on the cum-axis join:\n$opt")
      val phys = formattedPlan(joined)
      assert(!phys.contains("CartesianProduct") &&
        !phys.contains("BroadcastNestedLoopJoin"), phys)
      assert(alloc(joined) === naive,
        "binned FIFO allocations must equal the naive join's")
    } finally prevBin match {
      case Some(v) => spark.conf.set("spark.graft.intervalJoin.binUs", v)
      case None => spark.conf.unset("spark.graft.intervalJoin.binUs")
    }
  }

  test("joins without the overlap shape are left untouched") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("a_id", "a_v")
    val b = Seq((1L, 3L)).toDF("b_id", "b_v")
    withRule {
      // plain equi-join: must not be rewritten (no bin attr anywhere)
      val p = a.join(b, col("a_id") === col("b_id"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__graft_bin"), p)
    }
  }
}
