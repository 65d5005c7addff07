package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** F6 user-defined filter plugins + T5 multi-query fan-out.
  *
  * The reference discovers Python filter modules by reflection and runs
  * one Kafka-publishing streaming query per filter over a shared source
  * (ref: bin/ztf/distribute.py:46-50, 167-223). In Scala the registry is
  * explicit — `name → (DataFrame => Column)` — no reflection needed; the
  * fan-out topology (independent checkpoints, awaitAnyTermination, timed
  * shutdown) is preserved.
  */
object FilterRegistry {

  type AlertFilter = DataFrame => Column

  private val registry = TrieMap[String, AlertFilter]()

  def register(name: String, f: AlertFilter): Unit = registry.put(name, f)
  def unregister(name: String): Unit = registry.remove(name)
  def get(name: String): Option[AlertFilter] = registry.get(name)
  def names: Seq[String] = registry.keys.toSeq.sorted

  /** Topic name per filter, matching the reference's convention. */
  def topicFor(filterName: String, prefix: String = "fink"): String =
    s"${prefix}_${filterName}"

  /** T5: one streaming query per filter over the shared source; each
    * sink gets its own checkpoint dir under `checkpointRoot`.
    */
  def fanOut(
      source: DataFrame,
      filterNames: Seq[String],
      checkpointRoot: String,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sinkFor: (DataFrame, String, String) => StreamingQuery): Seq[StreamingQuery] =
    filterNames.map { name =>
      val f = registry.getOrElse(name, sys.error(s"unknown filter: $name"))
      val filtered = source.filter(f(source))
      sinkFor(filtered, name, s"$checkpointRoot/$name")
    }

  /** Block until any fan-out query fails or `exitAfterSecs` elapses,
    * then stop them politely (T6 timed shutdown, ref:
    * bin/ztf/stream2raw.py:179-184).
    */
  def awaitAll(
      spark: SparkSession,
      queries: Seq[StreamingQuery],
      exitAfterSecs: Option[Long] = None): Unit = {
    exitAfterSecs match {
      case Some(secs) =>
        spark.streams.awaitAnyTermination(secs * 1000L)
        queries.foreach(q => if (q.isActive) q.stop())
      case None =>
        spark.streams.awaitAnyTermination()
    }
  }
}
