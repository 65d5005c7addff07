package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SchemaRegistry

/** Versioned-schema behavior: stamp → probe → dispatch → upgrade. */
class SchemaRegistrySpec extends SparkTestBase {

  private val v1 = StructType(Seq(
    StructField("candid", LongType),
    StructField("rb", DoubleType)))
  private val v2 = StructType(Seq(
    StructField("candid", LongType),
    StructField("rb", DoubleType),
    StructField("drb", DoubleType))) // added in v2

  test("stamp, probe and dispatch by version") {
    import spark.implicits._
    SchemaRegistry.register("ztf", "1.0", v1)
    SchemaRegistry.register("ztf", "2.0", v2)
    assert(SchemaRegistry.versions("ztf") === Seq("1.0", "2.0"))
    assert(SchemaRegistry.latest("ztf").map(_._1) === Some("2.0"))

    val df = SchemaRegistry.stamp(Seq((1L, 0.9)).toDF("candid", "rb"), "1.0")
    assert(SchemaRegistry.probeVersion(df) === Some("1.0"))

    val out = SchemaRegistry.dispatch(df)(Map(
      "1.0" -> (d => d.withColumn("path", lit("v1"))),
      "2.0" -> (d => d.withColumn("path", lit("v2")))))
    assert(out.select("path").collect()(0).getString(0) === "v1")

    intercept[RuntimeException] {
      SchemaRegistry.dispatch(SchemaRegistry.stamp(df, "9.9"))(Map.empty)
    }
  }

  test("upgrade fills added fields with typed defaults") {
    import spark.implicits._
    SchemaRegistry.register("ztf", "1.0", v1)
    SchemaRegistry.register("ztf", "2.0", v2)
    val old = SchemaRegistry.stamp(Seq((7L, 0.5)).toDF("candid", "rb"), "1.0")
    val (upgraded, filled) = SchemaRegistry.upgradeTo(old, "ztf", "2.0")
    assert(filled === Seq("drb"))
    assert(SchemaRegistry.probeVersion(upgraded) === Some("2.0"))
    val r = upgraded.collect()(0)
    assert(r.getAs[Double]("drb") === 0.0 && r.getAs[Double]("rb") === 0.5)
  }
}
