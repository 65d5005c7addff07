package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed layout ⇒ exchange-free co-located joins (SURVEY §2 Y-rows).
  *
  * The whole point of paying the bucket shuffle at WRITE time is that
  * the read-side plan has no Exchange anywhere: scan → SortMergeJoin →
  * HashAggregate, with the scan's hash partitioning satisfying both the
  * join and the downstream per-key aggregate. These tests pin that plan
  * shape (broadcast disabled so a BHJ can't mask a missing colocation).
  */
class BucketingSpec extends SparkTestBase {

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-located join on bucketed tables plans zero exchanges") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("key", "lval")
    val right =
      (1 to 2000).map(i => ((i % 700).toLong, i)).toDF("key", "rval")
    Bucketing.writeBucketed(left, "bspec_left", "key", 4)
    Bucketing.writeBucketed(right, "bspec_right", "key", 4)

    withNoBroadcast {
      val joined =
        Bucketing.colocatedJoin(spark, "bspec_left", "bspec_right", "key")
      val plan = formattedPlan(joined)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)

      // the join's output partitioning also feeds the per-key aggregate:
      // still no exchange after groupBy on the bucket key
      val agged = joined.groupBy("key").agg(count(lit(1)).as("n"))
      val aggPlan = formattedPlan(agged)
      assert(!aggPlan.contains("Exchange"), aggPlan)

      // and the values are the plain join's values
      val expected = left.join(right, "key").count()
      assert(joined.count() == expected)
    }
  }

  test("one file per bucket elides the read-side sort") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, i * 2)).toDF("key", "v")
    Bucketing.writeBucketed(df, "bspec_sorted", "key", 4)
    Bucketing.writeBucketed(df, "bspec_sorted2", "key", 4)
    // Spark ≥3 only trusts bucket-file sort order under this flag (the
    // one-file-per-bucket invariant writeBucketed enforces is exactly
    // its precondition); without it the SMJ re-sorts each bucket.
    val flag = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.get(flag)
    spark.conf.set(flag, true)
    try withNoBroadcast {
      val plan = formattedPlan(
        Bucketing.colocatedJoin(spark, "bspec_sorted", "bspec_sorted2", "key"))
      // bucket files are written sorted and single-file, so SMJ needs no
      // per-partition Sort on either side
      assert(!plan.contains("Sort "), plan)
    } finally spark.conf.set(flag, prev)
  }
}
