package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming last-observation-carried-forward — the continuous face of
  * the q170 batch forward-fill: per key, NULL readings are repaired
  * with the most recent non-NULL value, where "most recent" carries
  * ACROSS micro-batches through the state store (one long + one flag
  * of state per key, however long the stream runs).
  *
  * Within a batch rows are folded in (ts, id) order — the stateful
  * analogue of the batch window's ORDER BY, and the reason the
  * repaired values are deterministic under replay: state is
  * checkpointed per batch, and the fold order within a batch is
  * fixed by the explicit sort key, not arrival order.
  *
  * Rows before the first non-NULL reading emit the -1 sentinel (same
  * contract as q170's batch form).
  */
object Locf {

  /** @param keyCol  grouping key column name
    * @param tsCol   long event-order column (epoch-µs)
    * @param idCol   long tie-break column
    * @param valCol  long value column, NULL = missing
    */
  def forwardFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"cast($keyCol as string) as k",
        s"cast($tsCol as long) as ts", s"cast($idCol as long) as id",
        s"cast($valCol as long) as v")
      .as[(String, Long, Long, Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long, Long, Boolean)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[(String, Long, Long, Option[Long])],
         state: GroupState[Long]) =>
          var carry = state.getOption.getOrElse(-1L)
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).map {
            case (_, ts, id, v) =>
              val wasMissing = v.isEmpty
              v.foreach(x => carry = x)
              (k, ts, id, if (wasMissing) carry else v.get, wasMissing)
          }
          if (carry != -1L) state.update(carry)
          out.iterator
      }
      .toDF(keyCol, tsCol, idCol, "filled", "was_missing")
  }
}
