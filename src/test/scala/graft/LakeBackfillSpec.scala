package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Backfill

/** Dynamic-partition backfill: only the touched partitions change;
  * untouched partition FILES survive byte-identically; static
  * overwrite (the default) would truncate the table — proven here so
  * the per-write option stays load-bearing.
  */
class LakeBackfillSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_lake_").toString
    (0 until 300)
      .map(i => (i.toLong, s"d${i % 3}", i * 10L))
      .toDF("id", "day", "v")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    dir
  }

  private def fileSet(dir: String, day: String): Set[(String, Long)] = {
    val p = Paths.get(dir, s"day=$day")
    import scala.jdk.CollectionConverters._
    Files.list(p).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(f => (f.getFileName.toString, Files.size(f))).toSet
  }

  test("backfill rewrites only its partitions; others survive untouched") {
    val dir = freshLake()
    val d0Before = fileSet(dir, "d0")
    val d2Before = fileSet(dir, "d2")
    // recompute day d1 only: double v for its rows. The slice is
    // materialized (cache+count) before the write — reading lazily
    // from the same path you overwrite races the commit
    val fixed = spark.read.parquet(dir)
      .filter(col("day") === "d1")
      .withColumn("v", col("v") * 2L)
      .select("id", "v", "day")
      .cache()
    fixed.count()
    Backfill.overwritePartitions(fixed, dir, Seq("day"))
    fixed.unpersist()
    val back = spark.read.parquet(dir)
    // d1 rows updated, row counts conserved
    assert(back.count() === 300L)
    assert(back.filter(col("day") === "d1")
      .filter(col("v") =!= col("id") * 20L).count() === 0L)
    assert(back.filter(col("day") === "d0")
      .filter(col("v") =!= col("id") * 10L).count() === 0L)
    // untouched partitions kept their exact files (names AND sizes)
    assert(fileSet(dir, "d0") === d0Before)
    assert(fileSet(dir, "d2") === d2Before)
  }

  test("static overwrite would truncate — dynamic is load-bearing") {
    val dir = freshLake()
    val fixed = spark.read.parquet(dir)
      .filter(col("day") === "d1")
      .select("id", "v", "day")
      .cache()
    fixed.count()
    // same write WITHOUT the dynamic option: the whole table is
    // replaced by the single backfilled partition
    fixed.write.mode("overwrite").partitionBy("day").parquet(dir)
    fixed.unpersist()
    val days = spark.read.parquet(dir)
      .select("day").distinct().collect().map(_.getString(0)).toSet
    assert(days === Set("d1"), s"static overwrite kept: $days")
  }
}
