package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.CorpusCuration
import graft.queries.Curation

/** The composed batch curation job: every stage's invariant holds on
  * the driver corpus, the output lake partitions prune, and the whole
  * pipeline is deterministic end to end.
  */
class CorpusCurationSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val curated = CorpusCuration.curate(docs).cache()

  test("gates: every surviving doc passes the repetition rules") {
    val kept = Curation.repetitionStats(docs)
      .filter(col("top_token_frac") <= 0.10 &&
        col("dup_2gram_frac") <= 0.08 && col("dup_3gram_frac") <= 0.05)
      .select("doc_id").as[Long].collect().toSet
    val out = curated.select("doc_id").as[Long].collect()
    assert(out.nonEmpty && out.forall(kept.contains),
      "a gated document leaked into the curated set")
  }

  test("dedup: canonical fingerprints are unique; PII spans are gone") {
    val fps = curated
      .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        .as("fp"))
      .groupBy("fp").count().filter(col("count") > 1).count()
    assert(fps === 0, "duplicate canonical fingerprint survived")
    val pii = curated.filter(
      col("text").rlike(Curation.EmailPat) ||
        col("text").rlike(Curation.PhonePat) ||
        col("text").rlike(Curation.IpPat)).count()
    assert(pii === 0, "unredacted PII pattern in curated text")
  }

  test("sampling and split: weights invert dyadic rates, splits cover 80/10/10") {
    val weights = curated.select("weight").distinct().as[Double].collect().toSet
    assert(weights.subsetOf(Set(1.0, 2.0, 256.0 / 192.0, 4.0)), weights.toString)
    val bySplit = curated.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    val n = bySplit.values.sum.toDouble
    assert(bySplit("train") / n > 0.7 && bySplit("train") / n < 0.9,
      bySplit.toString)
    // determinism: a re-run produces the identical document set
    val again = CorpusCuration.curate(docs)
      .select("doc_id").as[Long].collect().sorted
    assert(again.sameElements(
      curated.select("doc_id").as[Long].collect().sorted))
  }

  test("sampling never silently down-samples unrecognized sources") {
    // a real corpus's source names don't parse as "srcN" — the default
    // rate table must keep everything (weight 1), not quietly apply
    // the fallback rate
    val renamed = docs.withColumn("source", lit("commoncrawl"))
    val weights = CorpusCuration.curate(renamed)
      .select("weight").distinct().as[Double].collect().toSet
    assert(weights === Set(1.0), weights.toString)
  }

  test("dedup shuffle carries (fp, doc_id) only — text never rides it") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // perturb the input so the cached `curated` plan can't substitute
    // an InMemoryRelation for the subtree under inspection
    val df = CorpusCuration.curate(docs.filter(col("doc_id") >= 0))
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(!w.child.output.exists(_.name == "text"),
        s"document text crossed the dedup window:\n$w")
    }
  }

  test("lake: (split, source) partitions land and prune on read") {
    val dir = Files.createTempDirectory("curated-lake").toString
    CorpusCuration.write(curated, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === curated.count(), "lake lost documents")
    val train = spark.read.parquet(dir).filter(col("split") === "train")
    val plan = train.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(split"),
      s"split filter did not prune partitions:\n$plan")
    assert(train.count() === curated.filter(col("split") === "train").count())
  }
}
