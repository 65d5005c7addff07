package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming level-drift detection — the continuous face of the q161
  * CUSUM change-point operator: per key, a one-sided CUSUM against a
  * fixed reference level with O(1) state per key.
  *
  * Page's classic recursion (public algorithm, Page 1954):
  *   G⁺ ← max(0, G⁺ + (x − μ₀ − slack)),  alarm when G⁺ > h
  *   G⁻ ← max(0, G⁻ − (x − μ₀ + slack)),  alarm when G⁻ > h
  * All arithmetic on integer cents, so the statistic is exact and the
  * monitor's decisions are reproducible across restarts (the state
  * store checkpoints (G⁺, G⁻, n) per key — three longs, however long
  * the stream runs).
  *
  * Each micro-batch emits the updated (key, n, g_pos, g_neg,
  * drifted) row for keys it touched — Update output mode, same
  * contract as [[Stateful.runningCounts]].
  */
object DriftMonitor {

  /** @param refCents   reference level μ₀ in cents
    * @param slackCents the CUSUM slack (half the shift worth
    *                   detecting, conventionally)
    * @param threshold  alarm threshold h in cents
    */
  def cusum(
      df: DataFrame,
      keyCol: String,
      centsCol: String,
      refCents: Long,
      slackCents: Long,
      threshold: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"cast($keyCol as string) as k",
        s"cast($centsCol as long) as c")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), (String, Long, Long, Long, Boolean)](
        GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          var (gPos, gNeg, n) = state.getOption.getOrElse((0L, 0L, 0L))
          // rows within a batch fold in iterator order; the statistic
          // is per-key sequential by definition (a CUSUM is a fold)
          rows.foreach { case (_, c) =>
            gPos = math.max(0L, gPos + (c - refCents - slackCents))
            gNeg = math.max(0L, gNeg - (c - refCents + slackCents))
            n += 1
          }
          state.update((gPos, gNeg, n))
          (k, n, gPos, gNeg, gPos > threshold || gNeg > threshold)
      }
      .toDF(keyCol, "n", "g_pos", "g_neg", "drifted")
  }
}
