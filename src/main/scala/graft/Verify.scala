package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

import graft.core.GraftSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg (dev only; the driver passes two): run just the
    // named comma-separated queries — fast single-query iteration.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().appName("graft-verify").master(s"local[$cpus]"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val oracle = SparkEntry.oracleSql
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // oracle-bearing results must be primitive-only — an array cell
        // crashes the driver's pandas row-sort (the round-7 q86 `err`)
        if (oracle.contains(name))
          graft.core.OutputLint.assertDriverComparable(name, df.schema)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      // Throwable here is DELIBERATE (unlike Bench, which narrows to
      // NonFatal): every Verify result is independently hash-compared
      // by the driver, so a wrong result from a degraded JVM is
      // fail-visible — while aborting the run on one query's fatal
      // error would cost the whole round's correctness evidence.
      // Bench timings have no such cross-check, so there a fatal
      // error must kill the JVM.
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a stale result dir from a prior run would otherwise be
        // compared in place of the failed query, masking the failure;
        // a cleanup failure must stay THIS query's problem, not abort
        // the remaining queries
        try {
          val dir = Paths.get(outDir, name)
          if (Files.exists(dir)) {
            import scala.jdk.CollectionConverters._
            val walk = Files.walk(dir)
            try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
            finally walk.close()
          }
        } catch { case c: Throwable =>
          System.err.println(
            s"[verify] $name stale-output cleanup failed: ${c.getMessage}")
        }
      }
      // queries that persist() intermediates (LSH/ANN pipelines) have
      // materialized by now — drop their cached blocks so 68 queries'
      // caches don't accumulate in one long-lived session
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
