package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.GraftSession

/** One shared local session for the whole forked test JVM (suites run
  * sequentially under `Test / fork := true`).
  */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", cpus = 4)
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SharedSpark.spark
  def sf: String = SharedSpark.Sf0001

  /** Formatted physical plan after an action-free materialization. */
  def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString()
  }
}
