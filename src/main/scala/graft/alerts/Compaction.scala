package graft.alerts

import org.apache.spark.sql.DataFrame

/** Y2 stats-driven compaction: size output files from optimizer
  * statistics instead of guessing (ref: common/partitioning.py:108-152,
  * bin/ztf/merge.py:53-91 — same `optimizedPlan.stats.sizeInBytes`
  * internals, first-class API in Scala).
  */
object Compaction {

  val TargetBytesPerPartition: Long = 128L * 1024 * 1024

  /** Partition count so each output file lands near the target size. */
  def numPartitions(df: DataFrame, targetBytes: Long = TargetBytesPerPartition): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    math.max(1, (bytes / BigInt(targetBytes)).toInt +
      (if (bytes % BigInt(targetBytes) > 0) 1 else 0))
  }

  /** Coalesce (never shuffle) down to the stats-derived count — small
    * micro-batch files merge into ~128 MB files before archival.
    */
  def compact(df: DataFrame, targetBytes: Long = TargetBytesPerPartition): DataFrame = {
    val want = numPartitions(df, targetBytes)
    val have = df.rdd.getNumPartitions
    if (have > want) df.coalesce(want) else df
  }
}
