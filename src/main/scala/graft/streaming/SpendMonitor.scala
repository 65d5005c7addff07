package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key running spend summary on Spark 4's arbitrary-state API
  * (`transformWithState` + [[StatefulProcessor]]) — the successor of
  * `flatMapGroupsWithState` used by `streaming/Stateful.scala` and
  * `Throttle.scala`: state lives in named, individually-typed,
  * optionally-TTL'd handles inside the RocksDB state store instead of
  * one opaque per-key blob, so a processor can evolve its state
  * layout and let hot state expire without a manual timeout dance.
  *
  * Semantics: for each micro-batch, every key with input emits its
  * UPDATED lifetime (count, total, max) — the cross-batch
  * accumulation contract StatefulSpec pins for the old API, expressed
  * on the new one. O(1) state per key (three longs); TTL is surfaced
  * as a constructor knob because expiring idle keys is the
  * bounded-state story at 100 TB key cardinality.
  */
class SpendStatsProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("agg",
      Encoders.product[(Long, Long, Long)], ttl)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (n, tot, mx) =
      if (st.exists()) st.get() else (0L, 0L, Long.MinValue)
    rows.foreach { case (_, cents) =>
      n += 1; tot += cents; if (cents > mx) mx = cents
    }
    st.update((n, tot, mx))
    Iterator.single((key, n, tot, mx))
  }
}

object SpendMonitor {
  /** (user, cents) stream → per-batch (user, lifetime n, total, max). */
  def runningSpend(
      ds: Dataset[(Long, Long)]): Dataset[(Long, Long, Long, Long)] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new SpendStatsProcessor(), TimeMode.None(),
        OutputMode.Append())(Encoders.product[(Long, Long, Long, Long)])
}
