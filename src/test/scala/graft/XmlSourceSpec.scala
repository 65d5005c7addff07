package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Native XML file source (Spark 4): rowTag extraction, schema
  * inference, attribute handling, and the PERMISSIVE corrupt-record
  * quarantine — the file-source complement of q338's from_xml column
  * contract.
  */
class XmlSourceSpec extends SparkTestBase {

  private def writeXml(body: String): String = {
    val dir = Files.createTempDirectory("graft_xml_").toString
    Files.write(Paths.get(dir, "data.xml"), body.getBytes("UTF-8"))
    dir
  }

  test("rowTag read + schema inference + attributes") {
    val dir = writeXml(
      """<rows>
        |  <o kind="std"><id>1</id><name>alpha</name></o>
        |  <o kind="pro"><id>2</id><name>beta</name></o>
        |  <o kind="std"><id>3</id><name>gamma</name></o>
        |</rows>""".stripMargin)
    val df = spark.read.format("xml").option("rowTag", "o").load(dir)
    assert(df.count() === 3)
    assert(df.agg(sum("id")).head.getLong(0) === 6L)
    // attributes surface with the _ prefix
    assert(df.filter(col("_kind") === "std").count() === 2)
  }

  test("PERMISSIVE quarantines malformed rows into _corrupt_record") {
    val dir = writeXml(
      """<rows>
        |  <o><id>1</id><name>alpha</name></o>
        |  <o><id>oops</id><name>delta</name></o>
        |  <o><id>3</id><name>gamma</name></o>
        |</rows>""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.format("xml")
      .option("rowTag", "o")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).load(dir)
      .cache()
    try {
      assert(df.count() === 3)
      assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(df.filter(col("id").isNotNull).count() === 2)
      assert(df.agg(sum("id")).head.getLong(0) === 4L)
    } finally df.unpersist()
  }

  test("round trip: to_xml(struct) parses back with from_xml") {
    import spark.implicits._
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val xml = src.select(to_xml(struct(col("id"), col("name"))).as("x"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val back = xml.select(from_xml(col("x"), schema).as("p"))
      .select("p.id", "p.name")
    assert(back.agg(sum("id")).head.getLong(0) === 3L)
    assert(back.select("name").collect().map(_.getString(0)).toSet
      === Set("a", "b"))
  }
}
