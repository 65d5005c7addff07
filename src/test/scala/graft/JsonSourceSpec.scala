package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** JSON-lines file source: the remaining wire format after parquet
  * (S2/S3), Avro (S4), and CSV (K6's sink side) — schema inference,
  * explicit-schema reads, and the three malformed-record modes
  * (PERMISSIVE + _corrupt_record quarantine, DROPMALFORMED, FAILFAST).
  * Complements q321's from_json column-level contract with the
  * file-source-level one.
  */
class JsonSourceSpec extends SparkTestBase {

  private def writeJsonl(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_json_").toString
    val f = Paths.get(dir, "part-0.json")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private val good = Seq(
    """{"id": 1, "name": "alpha", "v": 1.5}""",
    """{"id": 2, "name": "beta", "v": -3.25}""",
    """{"id": 3, "name": "gamma", "v": 12.0}""")
  private val bad = Seq(
    """{"id": 4, "name": "delta", "v": """, // truncated
    """not json at all""")

  test("schema inference on clean JSONL") {
    val df = spark.read.json(writeJsonl(good))
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("id") === LongType)
    assert(byName("name") === StringType)
    assert(byName("v") === DoubleType)
    assert(df.count() === 3)
    assert(df.agg(sum("id")).head.getLong(0) === 6L)
  }

  test("PERMISSIVE quarantines malformed rows into _corrupt_record") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType), StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(writeJsonl(scala.util.Random.shuffle(good ++ bad)))
      .cache() // a corrupt-record query needs the raw row materialized
    try {
      assert(df.count() === 5)
      val quarantined = df.filter(col("_corrupt_record").isNotNull)
      assert(quarantined.count() === 2)
      // quarantined rows keep the raw payload for replay/debugging
      val raw = quarantined.select("_corrupt_record")
        .collect().map(_.getString(0)).toSet
      assert(raw === bad.toSet)
      // parsed rows carry their values; quarantined rows are null
      assert(df.filter(col("id").isNotNull).count() === 3)
    } finally df.unpersist()
  }

  test("DROPMALFORMED keeps only parseable rows") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val df = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(writeJsonl(good ++ bad))
    assert(df.count() === 3)
    assert(df.agg(sum("id")).head.getLong(0) === 6L)
  }

  test("FAILFAST throws on the first malformed row") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(writeJsonl(good ++ bad))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(
        _.getMessage.toLowerCase.contains("malformed")))
  }

  test("multiLine mode reads a top-level JSON array file") {
    val dir = Files.createTempDirectory("graft_json_arr_").toString
    Files.write(Paths.get(dir, "arr.json"),
      """[{"id": 10, "name": "x"}, {"id": 20, "name": "y"}]"""
        .getBytes("UTF-8"))
    val df = spark.read.option("multiLine", "true").json(dir)
    assert(df.count() === 2)
    assert(df.agg(sum("id")).head.getLong(0) === 30L)
  }

  test("round trip: to_json(struct) → text file → read back") {
    import spark.implicits._
    val src = Seq((1L, "a", 2.5), (2L, "b", -1.0)).toDF("id", "name", "v")
    val dir = Files.createTempDirectory("graft_json_rt_").toString + "/out"
    src.select(to_json(struct(col("id"), col("name"), col("v"))).as("js"))
      .write.text(dir)
    val back = spark.read.json(spark.read.text(dir).as[String])
    assert(back.count() === 2)
    assert(back.agg(sum("id")).head.getLong(0) === 3L)
    assert(back.select("name").collect().map(_.getString(0)).toSet
      === Set("a", "b"))
  }
}
