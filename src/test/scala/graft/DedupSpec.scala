package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.queries.Dedup

/** Behavior of the dedup operators on a planted fixture: exact copies,
  * near-duplicates (one word changed), and unrelated docs.
  */
class DedupSpec extends SparkTestBase {

  private lazy val base =
    "the quick brown fox jumps over the lazy dog near the river bank " +
      "while birds sing in the tall green trees above the quiet water"

  private lazy val fixture = {
    import spark.implicits._
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong), // exact copy of 0
      (2L, base.replace("quick", "rapid"), "en", "src2", base.length.toLong), // near-dup of 0
      (3L, "completely different text about spark catalyst optimizer rules " +
        "and whole stage code generation in distributed query engines today",
        "en", "src3", 120L),
      (4L, "short doc", "en", "src4", 9L) // < 3 tokens after shingling edge
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("exact dedup groups identical canonical forms") {
    val groups = fixture
      .groupBy(md5(normText(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("n"))
      .collect()
    val dupGroup = groups.find(_.getLong(2) == 2)
    assert(dupGroup.isDefined, "docs 0 and 1 should share a fingerprint")
    assert(dupGroup.get.getLong(1) === 0L)
  }

  test("minhash-LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup
      .lshCandidates(fixture)
      .withColumn("j", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= Dedup.JaccardThreshold)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 1L)), s"missed the exact pair: $pairs")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      s"missed the near-dup pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"false positive on unrelated doc: $pairs")
  }

  test("minhash signature is deterministic and k-long") {
    val sigs = fixture
      .filter(col("doc_id") === 0)
      .select(minhashSignature(wordShingles(col("text"), 3), Dedup.NumHashes).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sigs.length === Dedup.NumHashes)
    val again = fixture
      .filter(col("doc_id") === 0)
      .select(minhashSignature(wordShingles(col("text"), 3), Dedup.NumHashes).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sigs === again)
  }

  test("simhash: near-dups are close in Hamming distance, unrelated far") {
    val fps = fixture
      .select(col("doc_id"), simhash64(tokens(normText(col("text")))).as("h"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0L), fps(1L)) === 0, "identical docs must hash equal")
    assert(ham(fps(0L), fps(2L)) <= 12,
      s"near-dup too far: ${ham(fps(0L), fps(2L))}")
    assert(ham(fps(0L), fps(3L)) >= 16,
      s"unrelated too close: ${ham(fps(0L), fps(3L))}")
  }

  test("resolveClusters propagates the min id across chains") {
    import spark.implicits._
    // components: {1,2,3,7} via chain 1-2, 2-3, 3-7; {10,11}; {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("distributed min-label fixpoint agrees with local union-find") {
    import spark.implicits._
    // localLimit=0 forces the >cutoff distributed path on a graph
    // whose diameter (a 40-node chain) needs several fixpoint rounds,
    // plus a star and isolated pairs — the shapes that distinguish a
    // correct propagation from a one-hop approximation
    val chain = (0L until 39L).map(i => (100L + i, 101L + i))
    val star = Seq((500L, 501L), (500L, 502L), (500L, 503L))
    val pairs = (chain ++ star ++ Seq((900L, 901L)))
      .toDF("doc_a", "doc_b")
    val local = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.resolveClusters(pairs, localLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === local, "both paths must label identically")
    // and the labels are the true component minima
    (100L to 139L).foreach(n => assert(dist(n) === 100L))
    Seq(500L, 501L, 502L, 503L).foreach(n => assert(dist(n) === 500L))
    assert(dist(900L) === 900L && dist(901L) === 900L)
  }

  test("single-pass hash expressions equal their HOF reference forms") {
    val rows = fixture
      .filter(size(wordShingles(col("text"), 3)) > 0)
      .select(
        minhashSignature(wordShingles(col("text"), 3), 64).as("fast"),
        minhashSignatureHof(wordShingles(col("text"), 3), 64).as("ref"),
        simhash64(tokens(normText(col("text")))).as("sfast"),
        simhash64Hof(tokens(normText(col("text")))).as("sref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1),
        "minhash expression diverged from xxhash64 HOF semantics")
      assert(r.getLong(2) === r.getLong(3),
        "simhash expression diverged from xxhash64 HOF semantics")
    }
    val shingleRows = fixture.select(
      wordShingles(col("text"), 3).as("fast"),
      wordShinglesHof(col("text"), 3).as("ref")).collect()
    shingleRows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        "shingle expression diverged from the HOF form")
    }
  }

  test("prefix-filtered Jaccard pairs equal the brute-force block join") {
    import spark.implicits._
    // a fixture where the prefix filter has real work to do: shared
    // common words across all docs, rare words distinguishing them,
    // two planted ≥0.95 pairs (exact copy + one-token-in-21 change)
    val common = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, s"$common phi", "en"),
      (1L, s"$common phi", "en"), // exact copy of 0
      (2L, s"$common chi", "en"), // 20/22 union overlap with 0 — below 0.95
      (3L, s"$common psi omega", "en"),
      (4L, common, "fr"), // other lang block: never paired with 0-3
      (5L, s"$common phi", "fr"), // J(4,5)=20/21≈0.952: an fr pair
      (6L, s"$common phi extra1 extra2 extra3", "en")
    ).toDF("doc_id", "text", "lang")
    val prefix = Dedup.prefixJaccardPairs(docs)
      .select("lang", "doc_a", "doc_b", "jaccard").collect().toSet
    val salted = Dedup.saltedJaccardPairs(docs)
      .select("lang", "doc_a", "doc_b", "jaccard").collect().toSet
    assert(prefix === salted)
    assert(prefix.map(r => (r.getLong(1), r.getLong(2))) ===
      Set((0L, 1L), (4L, 5L)))
  }

  test("prefix candidate generation is complete at the size boundary") {
    import spark.implicits._
    // 19 shared + 1 differing token: J = 19/21 ≈ 0.905; at t=0.9 the
    // pair must survive, at t=0.95 it must not — both vs brute force
    val common = (1 to 19).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, s"$common only0", "en"),
      (1L, s"$common only1", "en")
    ).toDF("doc_id", "text", "lang")
    for (t <- Seq(0.9, 0.95)) {
      val p = Dedup.prefixJaccardPairs(docs, t).count()
      val s = Dedup.saltedJaccardPairs(docs, t).count()
      assert(p === s, s"threshold $t")
    }
  }

  test("prefix and salted Jaccard plans agree on randomized corpora") {
    import spark.implicits._
    // seeded random corpora over a small vocab (maximal collision
    // pressure on the prefix filter) across loose and tight thresholds
    val rnd = new scala.util.Random(20260812L)
    for (iter <- 1 to 3) {
      val vocab = (1 to 12).map(i => s"v$i")
      val docs = (0 until 40).map { id =>
        val n = 5 + rnd.nextInt(15)
        val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (id.toLong, text, if (rnd.nextBoolean()) "en" else "fr")
      }.toDF("doc_id", "text", "lang")
      for (t <- Seq(0.5, 0.8, 0.95)) {
        val key = (r: org.apache.spark.sql.Row) =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
        val p = Dedup.prefixJaccardPairs(docs, t)
          .select("lang", "doc_a", "doc_b", "jaccard").collect().map(key).toSet
        val s = Dedup.saltedJaccardPairs(docs, t)
          .select("lang", "doc_a", "doc_b", "jaccard").collect().map(key).toSet
        assert(p === s, s"iter $iter threshold $t")
      }
    }
  }

  test("SimHashMd5 expression equals its HOF reference form") {
    val toks = array_distinct(tokens(normText(col("text"))))
    val rows = fixture.select(
      graft.functions.HashFunctions.simhashMd5(toks).as("fast"),
      Dedup.simhashMd5Hof(toks).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(rows.nonEmpty)
  }

  test("SimHashMd5Wide matches an independent JVM reference, both paths") {
    // the q23 oracle proves cross-engine value parity at sf0.01; this
    // pins the compiled expression (codegen + interpreted agree with a
    // from-the-digest reference computed test-side)
    def ref(ts: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val tally = new Array[Int](64)
      ts.foreach { t =>
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        val h = (0 until 8).foldLeft(0L)((a, k) => (a << 8) | (d(k) & 0xffL))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      (63 to 0 by -1).foldLeft(0L)((a, b) =>
        (a << 1) | (if (tally(b) > 0) 1L else 0L))
    }
    val toks = array_distinct(tokens(normText(col("text"))))
    val rows = fixture.select(
      toks.as("tk"),
      graft.functions.HashFunctions.simhashMd5Wide(toks).as("fast")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("fast") === ref(r.getSeq[String](0))))
  }

  test("shingles of a short doc are empty, not an error") {
    val n = fixture
      .filter(col("doc_id") === 4)
      .select(wordShingles(col("text"), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(n.isEmpty)
  }
}
