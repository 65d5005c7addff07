package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.core.GraftSession

/** Dev tool: dump `.explain("formatted")` for registered queries.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...]
  *
  * Writes one `<outDir>/<query>.txt` per query (all registered queries
  * when no list is given). Used to produce the committed
  * `plans/r13/<query>_{before,after}.txt` evidence for optimization
  * rounds — the plan the driver's Bench would execute, captured
  * without running the job (AQE initial plan; Exchange count, join
  * strategy, PushedFilters/ReadSchema are all visible).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().appName("graft-plandump")
        .master(s"local[$cpus]"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(FormattedMode)
          Files.write(Paths.get(outDir, s"$name.txt"),
            txt.getBytes("UTF-8"))
          spark.catalog.clearCache()
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
