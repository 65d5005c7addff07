package graft

import org.apache.spark.sql.functions._

import graft.functions.{UnicodeExpressionsInternal, UnicodeFunctions}

/** NFC normalization: the codegen'd expression against JDK-reference
  * behavior, plus the q280 allocator's greedy-optimality contract.
  */
class UnicodeSpec extends SparkTestBase {

  test("nfc kernel: composes decomposed sequences, identity on ASCII") {
    import org.apache.spark.unsafe.types.UTF8String
    val dec = UTF8String.fromString("Cafe\u0301")
    val out = UnicodeExpressionsInternal.nfc(dec)
    assert(out.toString == "Caf\u00e9", "must compose to precomposed e-acute")
    assert(out.numChars() == 4 && dec.numChars() == 5)
    // pure-ASCII fast path returns the SAME object (no realloc)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(UnicodeExpressionsInternal.nfc(ascii) eq ascii)
    // already-NFC non-ASCII also passes through untouched
    val pre = UTF8String.fromString("caf\u00e9")
    assert(UnicodeExpressionsInternal.nfc(pre) eq pre)
  }

  test("expression: codegen and eval agree; nulls stay null") {
    import spark.implicits._
    val df = Seq(Some("e\u0301galite\u0301"), Some("ascii"), None)
      .toDF("s")
      .withColumn("n", UnicodeFunctions.nfcNormalize(col("s")))
    val rows = df.collect()
    assert(rows(0).getString(1) == "\u00e9galit\u00e9")
    assert(rows(1).getString(1) == "ascii")
    assert(rows(2).isNullAt(1))
    // length drop is visible to downstream expressions in the same
    // codegen stage: the decomposed input loses 2 combining chars
    val d = df.filter(col("s").startsWith("e"))
      .selectExpr("length(s) - length(n) as d")
      .head().getInt(0)
    assert(d == 2, s"expected 2 combining marks composed away, got $d")
  }

  test("letterHistogram equals the 26 length-minus-replace expressions") {
    // the r14 fused kernel counts BYTES; the replace form counted code
    // points — equal for ASCII targets because multi-byte UTF-8 never
    // contains ASCII byte values. Pin equality on real corpus text
    // plus adversarial rows: multi-byte letters adjacent to ASCII,
    // empty string, no letters at all.
    import spark.implicits._
    val corpus = graft.core.Tables.t(spark, SharedSpark.Sf001, "documents")
      .select(lower(col("text")).as("lt")).limit(500)
    val edge = Seq("", "éaé a zz", "ЖЖЖ", "aéb́c",
      "the quick brown fox").toDF("lt")
    val replaceForm = array(('a' to 'z').map(c =>
      (length(col("lt")) -
        length(expr(s"replace(lt, '$c', '')"))).cast("long")): _*)
    for (df <- Seq(corpus, edge)) {
      val bad = df
        .select(replaceForm.as("want"),
          graft.functions.UnicodeFunctions.letterHistogram(col("lt"))
            .as("got"))
        .filter(not(col("want") === col("got")))
        .count()
      assert(bad == 0L, "fused histogram diverged from the replace form")
    }
  }

  test("alphaCount/whitespaceCount equal their regexp_replace forms") {
    import spark.implicits._
    val corpus = graft.core.Tables.t(spark, SharedSpark.Sf001, "documents")
      .select(col("text").as("t")).limit(500)
    val edge = Seq("", "A b\tC\n", "éÉ Ж A", "no1letters2here!",
      " \t\n\f\r", "a b").toDF("t") // U+00A0 is NOT regex-\s
    val wantAlpha = length(regexp_replace(col("t"), "[^A-Za-z]", ""))
      .cast("long")
    val wantSpace = (length(col("t")) -
      length(regexp_replace(col("t"), "\\s", ""))).cast("long")
    for (df <- Seq(corpus, edge)) {
      val bad = df.filter(
        not(wantAlpha <=> graft.functions.UnicodeFunctions
          .alphaCount(col("t"))) ||
        not(wantSpace <=> graft.functions.UnicodeFunctions
          .whitespaceCount(col("t")))).count()
      assert(bad == 0L, "fused counters diverged from the regexp forms")
    }
  }

  test("q280: allocation equals the brute-force greedy over the lattice") {
    val toks = graft.core.Tables.t(spark, SharedSpark.Sf001, "documents")
      .select(col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val lattice = for ((src, tok) <- toks.toSeq; e <- 1 to 8)
      yield (src, e, tok * (1L << (8 - e)))
    val granted = lattice.sortBy { case (s0, e, g) => (-g, s0, e) }.take(30)
    val brute = granted.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q280_epoch_allocation")(
        spark, SharedSpark.Sf001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("epochs"))
      .toMap
    assert(got == brute, s"allocation mismatch: $got vs $brute")
    assert(got.values.sum == 30L, "budget must be fully spent")
  }
}
