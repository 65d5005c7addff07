package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-scoped backfill: recompute a slice of a partitioned lake
  * and overwrite ONLY the partitions that slice touches.
  *
  * `partitionOverwriteMode=dynamic` (set per-write, not session-wide)
  * makes `mode(overwrite)` replace exactly the partition directories
  * present in `updated` and leave every other partition's files
  * untouched — the nightly-reprocess / late-data-correction primitive
  * for a y/m/d-partitioned lake (ref layout Y1,
  * `bin/ztf/archive_science.py`-style trees). STATIC overwrite mode
  * would truncate the whole table first; LakeBackfillSpec asserts both
  * behaviors so the option stays load-bearing.
  *
  * At 100 TB the write cost is proportional to the backfilled
  * partitions only; untouched partitions are never read, listed or
  * rewritten. Combine with `Compaction` for file sizing inside the
  * rewritten partitions.
  */
object Backfill {

  def overwritePartitions(
      updated: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    updated.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
