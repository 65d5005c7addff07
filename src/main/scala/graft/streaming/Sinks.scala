package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.avro.AvroFunctions

/** Streaming sinks (SURVEY §2.2) with the reference's checkpoint/
  * trigger topology: one checkpoint per sink, append mode, optional
  * processing-time trigger (0 ⇒ as-fast-as-possible).
  */
object Sinks {

  def triggerOf(processingTimeSecs: Long): Trigger =
    if (processingTimeSecs <= 0) Trigger.ProcessingTime(0L)
    else Trigger.ProcessingTime(processingTimeSecs * 1000L)

  /** K1: parquet append sink with checkpoint + optional y/m/d layout. */
  def parquetSink(
      df: DataFrame,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      partitionCols: Seq[String] = Nil,
      queryName: Option[String] = None): StreamingQuery = {
    var w = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    queryName.foreach(n => w = w.queryName(n))
    w.start()
  }

  /** K3: foreachBatch sink — the adapter seam for batch-only writers
    * (the reference wraps its HBase writer this way).
    */
  def foreachBatchSink(
      df: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      f: (Dataset[Row], Long) => Unit): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(f)
      .start()

  /** K7: noop sink (materialize-only, test/bench). */
  def noopSink(df: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    df.writeStream
      .format("noop")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** K6: Complete-mode CSV workaround — file sinks can't run complete
    * mode, so each batch's full result overwrites one CSV (ref:
    * common/spark_utils.py:126-155 does driver-side to_csv; here it
    * stays an executor write).
    */
  def csvCompleteSink(
      aggregated: DataFrame,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    aggregated.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(path)
      }
      .start()

  /** Streaming dedup with bounded state (T7 headroom: the reference
    * runs no stateful operators; this is the watermarked form the
    * rebuild offers when at-least-once upstream delivery needs
    * de-duplication): duplicates of `keys` within the watermark horizon
    * are dropped, state for expired event times is reclaimed.
    */
  def dedupStream(
      df: DataFrame,
      keys: Seq[String],
      eventTimeCol: String,
      watermark: String): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .dropDuplicates(keys :+ eventTimeCol)

  /** K2 payload shape: the Kafka message frame the reference publishes —
    * value = avro(struct(all columns)), key = the reader schema JSON,
    * partition = uniform random spread (ref: common/distribution_utils
    * .py:92-140). Pure transform, usable on static or streaming frames.
    */
  def kafkaPayload(df: DataFrame, nPartitions: Option[Int] = None): DataFrame = {
    val schemaJson = AvroFunctions.avroSchemaJson(df.schema)
    val base = df.select(
      lit(schemaJson).cast("binary").as("key"),
      AvroFunctions.toAvro(struct(df.columns.map(col): _*)).as("value"))
    nPartitions match {
      case Some(n) =>
        base.withColumn("partition", (rand(seed = 0) * n).cast("int"))
      case None => base
    }
  }

  /** K2: Kafka sink writer (requires the kafka connector at runtime). */
  def kafkaSink(
      df: DataFrame,
      servers: String,
      topic: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      nPartitions: Option[Int] = None): DataStreamWriter[Row] =
    kafkaPayload(df, nPartitions).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
}
