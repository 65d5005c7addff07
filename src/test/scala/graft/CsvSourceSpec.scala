package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** CSV file source — header handling, schema inference, quoted fields
  * with embedded delimiters/newlines, and the malformed-record modes
  * (PERMISSIVE quarantine / DROPMALFORMED / FAILFAST). The read-side
  * complement of K6's CSV sink.
  */
class CsvSourceSpec extends SparkTestBase {

  private def writeCsv(lines: Seq[String], name: String): String = {
    val dir = Files.createTempDirectory("graft_csv_").toString
    Files.write(Paths.get(dir, s"$name.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private val header = "id,name,v"
  private val good = Seq("1,alpha,1.5", "2,beta,-3.25", "3,gamma,12.0")
  // wrong arity and a non-numeric value in a numeric column
  private val bad = Seq("4,delta", "five,epsilon,2.5,extra")

  test("header + schema inference") {
    val df = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(writeCsv(header +: good, "clean"))
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(Set("id", "name", "v") === byName.keySet)
    assert(byName("v") === DoubleType)
    assert(df.count() === 3)
  }

  test("quoted fields keep embedded delimiters and newlines") {
    val dir = writeCsv(Seq(
      header,
      "1,\"comma, inside\",1.0",
      "2,\"line\nbreak\",2.0"), "quoted")
    val df = spark.read
      .option("header", "true").option("multiLine", "true")
      .csv(dir)
    assert(df.count() === 2)
    val names = df.select("name").collect().map(_.getString(0)).toSet
    assert(names === Set("comma, inside", "line\nbreak"))
  }

  test("PERMISSIVE quarantines malformed rows into _corrupt_record") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType), StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(writeCsv(header +: (good ++ bad), "dirty"))
      .cache()
    try {
      assert(df.count() === 5)
      val quarantined = df.filter(col("_corrupt_record").isNotNull)
      assert(quarantined.count() === 2)
      assert(df.filter(col("id").isNotNull && col("v").isNotNull)
        .count() === 3)
    } finally df.unpersist()
  }

  test("DROPMALFORMED keeps only conforming rows") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val df = spark.read.schema(schema)
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(writeCsv(header +: (good ++ bad), "dirty2"))
    // collect() the full rows: malformed detection only fires for
    // columns the plan actually reads, so a pruned count() would
    // parse nothing and drop nothing (the CSV count-pushdown quirk)
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(0)).sum === 6L)
  }

  test("FAILFAST throws on the first malformed row") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema)
        .option("header", "true").option("mode", "FAILFAST")
        .csv(writeCsv(header +: (good ++ bad), "dirty3"))
        .collect()
    }
    val all = (ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(all.contains("malformed"))
  }

  test("nullValue and custom delimiter round the parser surface out") {
    val dir = writeCsv(Seq("id|name|v", "1|NA|2.0", "2|x|NA"), "pipes")
    val df = spark.read
      .option("header", "true").option("sep", "|")
      .option("nullValue", "NA").option("inferSchema", "true")
      .csv(dir)
    assert(df.filter(col("name").isNull).count() === 1)
    assert(df.filter(col("v").isNull).count() === 1)
  }
}
