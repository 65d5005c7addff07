package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming per-key throttle (debounce): emit an event only if at
  * least `minGapUs` has elapsed since the key's last EMITTED event —
  * the alert-fatigue / notification-rate-limit operator.
  *
  * This is inherently SEQUENTIAL state: whether row i passes depends on
  * which earlier rows passed, so no window/aggregation can express it
  * (a `lag` compares against the previous ROW, not the previous
  * SURVIVOR). `flatMapGroupsWithState` carries exactly one long per key
  * (the last emitted timestamp) across micro-batches, so the decision
  * is identical however the stream is chopped into batches — asserted
  * by ThrottleSpec against a single-pass batch fold.
  *
  * Within a batch rows fold in (ts, id) order (the stateful analogue of
  * ORDER BY, deterministic under replay); state is O(1) per key and the
  * shuffle is the one groupByKey exchange any keyed stateful op pays.
  * Suppressed rows are dropped, and each emitted row carries the count
  * of rows suppressed since the previous emission (the digest a
  * downstream pager wants).
  */
object Throttle {

  /** @param keyCol   grouping key column name
    * @param tsCol    long event-time column (epoch-µs)
    * @param idCol    long tie-break column
    * @param minGapUs minimum µs between emitted events per key
    */
  def throttle(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      minGapUs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"cast($keyCol as string) as k",
        s"cast($tsCol as long) as ts", s"cast($idCol as long) as id")
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          // state = (last emitted ts, suppressed-since-then count);
          // Long.MinValue = nothing emitted yet
          var (lastEmit, suppressed) =
            state.getOption.getOrElse((Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).flatMap {
            case (_, ts, id) =>
              if (lastEmit == Long.MinValue || ts - lastEmit >= minGapUs) {
                val n = suppressed
                lastEmit = ts
                suppressed = 0L
                Some((k, ts, id, n))
              } else {
                suppressed += 1L
                None
              }
          }
          state.update((lastEmit, suppressed))
          out.iterator
      }
      .toDF(keyCol, tsCol, idCol, "n_suppressed_before")
  }

  /** Reference single-pass batch fold of the same contract — what the
    * streaming form must match for ANY micro-batch chopping. */
  def batchReference(
      rows: Seq[(String, Long, Long)],
      minGapUs: Long): Seq[(String, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      var lastEmit = Long.MinValue
      var suppressed = 0L
      rs.sortBy(r => (r._2, r._3)).flatMap { case (_, ts, id) =>
        if (lastEmit == Long.MinValue || ts - lastEmit >= minGapUs) {
          val n = suppressed
          lastEmit = ts
          suppressed = 0L
          Some((k, ts, id, n))
        } else { suppressed += 1L; None }
      }
    }
}
