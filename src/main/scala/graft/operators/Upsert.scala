package graft.operators

import org.apache.spark.sql.DataFrame

/** Keyed upsert (MERGE INTO semantics, the serving-table refresh path):
  * rows from `updates` replace base rows with the same key; unmatched
  * base rows pass through; brand-new keys insert.
  *
  * Plan shape: one LEFT ANTI join of base against the update KEYS plus
  * a union — no shuffle of the update payload against the base, and
  * since a nightly update batch is ≪ the archive, the anti join's
  * build side broadcasts (AQE picks it from runtime sizes; asserted in
  * UpsertSpec). The base is scanned exactly once.
  */
object Upsert {

  /** PRECONDITION: `updates` must carry at most one row per key. ANSI
    * MERGE INTO raises on multiple matches; this plan-only operator
    * cannot check that without materializing the update batch, so a
    * duplicate-keyed batch passes through as duplicate output rows.
    * Call [[upsertChecked]] to pay one aggregation for the guarantee.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val keyOnly = updates.select(keys.map(updates.col): _*)
    updates.unionByName(base.join(keyOnly, keys, "left_anti"))
  }

  /** [[upsert]] with the MERGE INTO multiple-match check: raises if
    * `updates` contains duplicate keys (costs one groupBy job over the
    * update batch — small by the operator's own design assumption).
    */
  def upsertChecked(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val dupes = updates.groupBy(keys.map(updates.col): _*)
      .count().filter(org.apache.spark.sql.functions.col("count") > 1)
    val sample = dupes.limit(3).collect()
    require(sample.isEmpty,
      s"updates carry multiple rows per key (MERGE INTO multiple-match): " +
        sample.mkString(", "))
    upsert(base, updates, keys)
  }
}
