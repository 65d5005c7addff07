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
    StructField("ypos", DoubleType)       // CCD y position
  ))

  val alertSchema: StructType = StructType(Seq(
    StructField("objectId", StringType, nullable = false),
    StructField("candid", LongType, nullable = false),
    StructField("schemavsn", StringType),
    StructField("publisher", StringType),
    StructField("candidate", candidateFields),
    StructField("prv_candidates", ArrayType(candidateFields)),
    StructField("cutoutScience", StructType(Seq(
      StructField("fileName", StringType),
      StructField("stampData", BinaryType)))))
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
    def det(jd: Double): Row = Row(
      jd,
      rng.nextDouble() * 360.0,
      rng.nextDouble() * 180.0 - 90.0,
      1 + rng.nextInt(3),
      (15 + rng.nextDouble() * 6).toFloat,
      (0.01 + rng.nextDouble() * 0.3).toFloat,
      if (rng.nextDouble() < 0.1) 1 + rng.nextInt(3) else 0,
      (if (rng.nextDouble() < 0.1) rng.nextDouble() * 0.5 else 0.55 + rng.nextDouble() * 0.45).toFloat,
      rng.nextDouble().toFloat,
      if (rng.nextBoolean()) "t" else "f",
      rng.nextDouble() * 3000,
      rng.nextDouble() * 3000)
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
        (1 to nPrv).map(h => det(jd - h * 0.04)),
        Row(s"cutout_$i.fits", Array.tabulate[Byte](16)(b => ((i + b) % 127).toByte)))
    }
    spark.createDataFrame(rows.asJava, alertSchema)
  }
}
