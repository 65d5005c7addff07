package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive input spread for unsplittable scans (guide §2.5).
  *
  * The driver's test tables are single parquet files with ONE row
  * group, so a scan is exactly one task no matter how
  * `maxPartitionBytes` / `minPartitionNum` are set — a parquet file
  * cannot split below row-group grain. Every per-row kernel between
  * the scan and the first exchange (tokenize → shingle → md5/xxhash
  * explode, per-char HOFs, distance folds) therefore runs on one core
  * of N, which is the optimization guide's "input skew: one huge
  * unsplittable file" case; its prescribed fix is "repartition
  * immediately after the read".
  *
  * [[byKey]] applies that fix ONLY when the plan's native parallelism
  * is actually below the session's default parallelism: on a real
  * many-file table (the 100 TB shape) the scan is already parallel
  * and the spread is a no-op — the corpus is never shuffled just to
  * spread it. The partition count is read from the physical plan at
  * build time (no job runs).
  *
  * Keyed, not round-robin: a deterministic hash key keeps retried
  * tasks reproducible (SPARK-38388 — round-robin needs a local sort
  * for that, a cost this avoids) and lets a downstream groupBy/join
  * on the same key reuse the partitioning (guide §2.4).
  */
object InputSpread {

  /** Contract: call on an exchange-free frame (scan + projections /
    * filters / unions only). Reading `df.rdd.getNumPartitions` builds
    * the physical plan without running a job for such frames; a frame
    * that already contains an exchange would have to materialize
    * query stages to answer it under AQE. */
  def byKey(df: DataFrame, key: Column): DataFrame = byKey(df, key, df)

  /** Same gate, but the native-parallelism probe reads a SEPARATE
    * exchange-free frame (normally the base-table scan feeding `df`).
    * For a `df` that already contains a join, `df.rdd.getNumPartitions`
    * would have to materialize query stages under AQE (running real
    * work at plan-build time); probing the scan keeps the gate job-free
    * while answering the question that actually matters — whether the
    * INPUT arrives unsplittably. */
  def byKey(df: DataFrame, key: Column, probe: DataFrame): DataFrame = {
    val native = probe.rdd.getNumPartitions
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (native < target) df.repartition(key) else df
  }
}
