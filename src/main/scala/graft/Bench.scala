package graft
import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Materialization is a `noop`-format write (not `.count()`): count lets
  * Catalyst prune every projected column, which would benchmark a scan of
  * nothing for projection-heavy queries; noop forces full evaluation of
  * the select list on the executors with zero sink cost.
  *
  * A failed query reports -1.0 so it can never be mistaken for a timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().appName("graft-bench").master(s"local[$cpus]"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT/codegen compile + parquet footer reads happen before
    // the clock starts, so the first query isn't billed for session
    // startup
    spark.range(1000000).selectExpr("sum(id) s").write
      .format("noop").mode("overwrite").save()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).write
        .format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // dev-only subset selector (the driver sets neither): comma list
    // of query names for single-query timing iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // dev-only warm min-of-N (the driver never sets it, default 1 is
    // the exact driver behavior): repeat each query N times in THIS
    // JVM and report the per-query minimum — the bench-discipline
    // steady-state audit without relaunching a JVM per sample. The
    // first iteration bills one-time artifact builds + JIT; the min
    // reads warm cost. clearCache runs per ATTEMPT so per-query
    // persists stay billed to their own query on every sample.
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // NonFatal only: an OOM/LinkageError mid-query leaves the JVM
        // in an unknown state — every later timing would be suspect —
        // so fatal errors must kill the run, not record -1 and continue
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // per-query persist() caches (LSH/ANN pipelines) are billed to
        // their own query, then dropped so later timings run cache-cold
        spark.catalog.clearCache()
        if (ok) sec else -1.0
      }
      // ANY failed attempt keeps the -1 sentinel — a min over the
      // successful attempts would hide an intermittent failure behind
      // a clean timing, breaking the "-1 can never be mistaken for a
      // timing" contract the records rely on
      name -> (if (secs.forall(_ >= 0)) secs.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // ALSO persist the full line: the stdout capture some harnesses
    // keep is tail-truncated, losing most per-query timings — the
    // file keeps every timing readable after the run. Fixed name,
    // overwritten per run: repeated runs must not accumulate
    // untracked files inside the tracked bench_local/ directory.
    // Anchored at the repo root (nearest ancestor of CWD holding
    // build.sbt) so running Bench from a subdirectory doesn't scatter
    // bench_local/ copies; catch stays NonFatal — an OOM or interrupt
    // here must kill the JVM, not be reported as a skipped capture.
    try {
      val root = Iterator
        .iterate(java.nio.file.Paths.get("").toAbsolutePath)(_.getParent)
        .takeWhile(_ != null)
        .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
        .getOrElse(java.nio.file.Paths.get("").toAbsolutePath)
      val dir = root.resolve("bench_local")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(
        dir.resolve("last_bench.json"), (line + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] file capture skipped: ${e.getMessage}")
    }
    spark.stop()
  }
}
