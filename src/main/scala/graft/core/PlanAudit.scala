package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** First-class plan-hygiene audit: the properties this repo's specs
  * assert by string-grep, exposed as a typed summary so pipelines can
  * gate on them programmatically ("no new exchange in the nightly
  * spine", "every scan pushes a filter") the same way they gate on
  * data quality (q132).
  *
  * Walks the EXECUTED plan including materialized AQE stages —
  * `summarize` after an action to audit the final adaptive plan.
  */
object PlanAudit {

  final case class Summary(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      scans: Int,
      scansWithPushedFilters: Int,
      wholeStageCodegenSpans: Int,
      sorts: Int,
      windows: Int,
      cartesianProducts: Int,
      broadcastNestedLoopJoins: Int)

  /** Flatten the plan tree through AQE wrappers and reused stages. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: children.flatMap(nodes)
  }

  def summarize(df: DataFrame): Summary = {
    val ns = nodes(df.queryExecution.executedPlan)
    Summary(
      shuffleExchanges = ns.count(_.isInstanceOf[ShuffleExchangeLike]),
      broadcastExchanges = ns.count(_.isInstanceOf[BroadcastExchangeLike]),
      scans = ns.count(_.isInstanceOf[FileSourceScanExec]),
      scansWithPushedFilters = ns.count {
        case s: FileSourceScanExec => s.dataFilters.nonEmpty ||
          s.partitionFilters.nonEmpty
        case _ => false
      },
      wholeStageCodegenSpans = ns.count(_.isInstanceOf[WholeStageCodegenExec]),
      sorts = ns.count(_.isInstanceOf[SortExec]),
      windows = ns.count(_.isInstanceOf[WindowExec]),
      cartesianProducts = ns.count(_.isInstanceOf[CartesianProductExec]),
      broadcastNestedLoopJoins =
        ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
