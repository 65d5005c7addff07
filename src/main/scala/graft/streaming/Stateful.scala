package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `mapGroupsWithState` (headroom beyond the
  * reference's stateless spine, SURVEY §2.13 T7): per-key accumulators
  * that survive across micro-batches through the state store, with
  * optional processing-time expiry to bound state size.
  */
object Stateful {

  /** Cumulative alert count per key: each micro-batch emits the updated
    * (key, n_total) for keys it touched. State lives in the checkpointed
    * state store — exactly-once across restarts like any stateful op.
    */
  def runningCounts(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"cast($key as string) as k")
      .as[String]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[String], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (k, n)
      }
      .toDF(key, "n_total")
  }

  /** Output mode stateful ops require. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()

  /** Watermarked tumbling/sliding event-time window aggregation: counts
    * per (key, window), late rows beyond `watermark` dropped by the
    * engine. With `slide == width` the windows tumble; a smaller slide
    * overlaps them (each event lands in width/slide windows). Append
    * mode emits each window once, when the watermark passes its end —
    * the exactly-once aggregate the brief's streaming contract names.
    */
  def windowedCounts(
      df: DataFrame,
      eventTimeCol: String,
      key: String,
      width: String,
      slide: String,
      watermark: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, window}
    df.withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), width, slide), col(key))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col(key), col("n"))
  }

  /** Streaming exact dedup — the continuous-ingestion form of the
    * batch exact-dedup operator (queries/Dedup q20): keep the first
    * row per key, dropping re-deliveries. With
    * `withinWatermark = Some(w)` the key state expires once the
    * event-time watermark passes `w` beyond a key's last sighting
    * (`dropDuplicatesWithinWatermark`) — the 100 TB form: unbounded
    * streams cannot keep every key forever, and upstream re-delivery
    * windows (e.g. a night's Kafka replay) are finite in practice.
    * Without it the dedup is global and state grows with distinct keys.
    */
  def streamingDedup(
      df: DataFrame,
      keyCols: Seq[String],
      withinWatermark: Option[(String, String)] = None): DataFrame =
    withinWatermark match {
      // (eventTimeCol, delay) travel together — a watermark without its
      // event-time column (or vice versa) is unrepresentable.
      case Some((eventTimeCol, w)) =>
        df.withWatermark(eventTimeCol, w)
          .dropDuplicatesWithinWatermark(keyCols)
      case None =>
        df.dropDuplicates(keyCols)
    }

  /** Session windows by inactivity gap: the streaming counterpart of
    * the batch gap-sessionization operator (operators/Sessionize) —
    * state is one open session per key, closed and emitted once the
    * watermark passes `gap` past its last event.
    */
  def sessionCounts(
      df: DataFrame,
      eventTimeCol: String,
      key: String,
      gap: String,
      watermark: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    df.withWatermark(eventTimeCol, watermark)
      .groupBy(session_window(col(eventTimeCol), gap), col(key))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col(key), col("n"))
  }
}
