package graft.alerts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** ZTF-shaped alert schema + deterministic fixture generator.
  *
  * Shape follows the reference's alert packet (ref:
  * utest/datasets/schemas/schema_20190903.avsc; fink_broker/ztf/
  * hbase_utils.py:116-232): top-level ids, a `candidate` struct holding
  * the current detection, a `prv_candidates` history array with the same
  * per-detection fields, and binary cutout stamps. Field subset — enough
  * to exercise every nested operator (X1-X5, P1-P5) with real structure.
  */
object AlertSchema {

  val candidateFields: StructType = StructType(Seq(
    StructField("jd", DoubleType),        // julian date of detection
    StructField("ra", DoubleType),        // right ascension, deg
    StructField("dec", DoubleType),       // declination, deg
    StructField("fid", IntegerType),      // filter band id (1/2/3)
    StructField("magpsf", FloatType),     // PSF magnitude
    StructField("sigmapsf", FloatType),   // magnitude error
    StructField("nbad", IntegerType),     // bad-pixel count
    StructField("rb", FloatType),         // real-bogus score
    StructField("drb", FloatType),        // deep real-bogus score
    StructField("isdiffpos", StringType), // detection polarity t/f
    StructField("xpos", DoubleType),      // CCD x position
    StructField("ypos", DoubleType),      // CCD y position
    StructField("magnr", FloatType),      // mag of nearest reference source
    StructField("sigmagnr", FloatType),   // its magnitude error
    StructField("distnr", FloatType),     // dist to nearest ref source, arcsec
    StructField("diffmaglim", FloatType), // 5-sigma limiting magnitude
    StructField("ndethist", IntegerType), // number of prior detections
    StructField("jdstarthist", DoubleType), // jd of first detection
    StructField("sgscore1", FloatType),   // star-galaxy score, nearest PS1 src
    StructField("distpsnr1", FloatType),  // dist to nearest PS1 src, arcsec
    StructField("ssdistnr", FloatType),   // dist to nearest known SSO (<0: none)
    StructField("ssnamenr", StringType)   // SSO designation when matched
  ))

  val cutoutType: StructType = StructType(Seq(
    StructField("fileName", StringType),
    StructField("stampData", BinaryType)))

  val alertSchema: StructType = StructType(Seq(
    StructField("objectId", StringType, nullable = false),
    StructField("candid", LongType, nullable = false),
    StructField("schemavsn", StringType),
    StructField("publisher", StringType),
    StructField("candidate", candidateFields),
    StructField("prv_candidates", ArrayType(candidateFields)),
    // the three ZTF stamps travel with the alert end to end (ref:
    // bin/ztf/distribute.py:89-95 re-packs all three; only the archive
    // ingest drops them, ref: bin/ztf/archive_science.py:72)
    StructField("cutoutScience", cutoutType),
    StructField("cutoutTemplate", cutoutType),
    StructField("cutoutDifference", cutoutType))
  )

  /** Deterministic synthetic alert batch: `n` alerts over `nObjects`
    * objects, each with 0-4 history detections; a seeded PRNG stands in
    * for the telescope. ~10% of alerts fail the quality cuts so filter
    * behavior is observable.
    */
  def fixture(spark: SparkSession, n: Int, nObjects: Int = 0, seed: Long = 42L): DataFrame = {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.Row
    val objs = if (nObjects > 0) nObjects else math.max(n / 3, 1)
    val rng = new scala.util.Random(seed)
    // history entries can be UPPER LIMITS (non-detections): magpsf /
    // sigmapsf / rb null, diffmaglim carries the depth — the shape the
    // upper/uppervalid index tables key on (ref: bin/ztf/archive_index
    // .py:171-264). The current detection is always a measurement.
    def det(jd: Double, canBeUpper: Boolean = false): Row = {
      val hasSso = rng.nextDouble() < 0.08
      val isUpper = canBeUpper && {
        val r = rng.nextDouble(); r < 0.3
      }
      Row(
        jd,
        rng.nextDouble() * 360.0,
        rng.nextDouble() * 180.0 - 90.0,
        1 + rng.nextInt(3),
        if (isUpper) null else (15 + rng.nextDouble() * 6).toFloat,
        if (isUpper) null else (0.01 + rng.nextDouble() * 0.3).toFloat,
        if (rng.nextDouble() < 0.1) 1 + rng.nextInt(3) else 0,
        if (isUpper) null
        else (if (rng.nextDouble() < 0.1) rng.nextDouble() * 0.5
              else 0.55 + rng.nextDouble() * 0.45).toFloat,
        rng.nextDouble().toFloat,
        if (rng.nextBoolean()) "t" else "f",
        rng.nextDouble() * 3000,
        rng.nextDouble() * 3000,
        (14 + rng.nextDouble() * 4).toFloat,
        (0.01 + rng.nextDouble() * 0.2).toFloat,
        (rng.nextDouble() * 5).toFloat,
        (19 + rng.nextDouble() * 2).toFloat,
        1 + rng.nextInt(20),
        jd - rng.nextInt(30),
        rng.nextDouble().toFloat,
        (rng.nextDouble() * 30).toFloat,
        // no-match is encoded as null on real ZTF alerts and as a -999
        // sentinel in some archive dumps — emit both so the science
        // modules' null handling is exercised (ADVICE r3)
        if (hasSso) (rng.nextDouble() * 10).toFloat
        else if (rng.nextBoolean()) -999.0f else null,
        if (hasSso) s"${2020 + rng.nextInt(6)} SO${rng.nextInt(300)}" else null)
    }
    def cutout(i: Int, kind: String): Row =
      Row(s"cutout_${kind}_$i.fits",
        Array.tabulate[Byte](16)(b => ((i + b + kind.length) % 127).toByte))
    val rows = (0 until n).map { i =>
      val obj = "ZTF" + (18000000 + i % objs)
      val jd = 2459000.5 + i.toDouble / 100.0
      val nPrv = rng.nextInt(5)
      Row(
        obj,
        1000000000L + i,
        "3.3",
        "graft-fixture",
        det(jd),
        (1 to nPrv).map(h => det(jd - h * 0.04, canBeUpper = true)),
        cutout(i, "science"),
        cutout(i, "template"),
        cutout(i, "difference"))
    }
    spark.createDataFrame(rows.asJava, alertSchema)
  }
}
