package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign each row a per-key session id,
  * where a new session starts when the time since the previous row of
  * the same key exceeds `gap`.
  *
  * One shuffle+sort on (key, time, tieBreak); the session id is a
  * running sum of session-start flags — the standard "gaps and islands"
  * shape, which Spark executes as a single Window exchange. State per
  * partition is one counter, so the operator survives arbitrarily long
  * per-key histories (unlike collect_list-based sessionizers).
  *
  * `tieBreak` makes the ordering total when two rows of a key share a
  * timestamp — without it the lag() is nondeterministic across runs
  * and engines.
  */
object Sessionize {

  def withSessionId(
      df: DataFrame,
      key: String,
      time: Column,
      tieBreak: Column,
      gap: Long,
      out: String = "session_id"): DataFrame = {
    val order = Window.partitionBy(key).orderBy(time.asc, tieBreak.asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(time, 1).over(order)
    val isNew = when(prev.isNull || time - prev > gap, 1L).otherwise(0L)
    df.withColumn(out, sum(isNew).over(running))
  }
}
