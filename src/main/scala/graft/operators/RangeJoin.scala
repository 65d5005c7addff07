package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs rows that share a key and fall within a
  * fixed-width time band, without ever running an inequality join.
  *
  * Spark's built-in answer to `ON a.key = b.key AND b.t BETWEEN a.t AND
  * a.t + W` is BroadcastNestedLoop (or a sort-merge with a residual that
  * still scans the whole key group). The scale-safe shape is the same
  * bucketing discipline as the LSH pipelines: quantize time into
  * W-sized bins, duplicate the LEFT side into (bin, bin+1) — any right
  * row within [t, t+W] lands in one of those two bins — equi-join on
  * (key, bin), then re-check the exact band predicate. Shuffle volume
  * is 2|L| + |R| keyed rows; no key group is ever cross-producted
  * beyond its bin-local candidates.
  */
object RangeJoin {

  /** Pairs (left, right) with `right(rTime)` in `[left(lTime),
    * left(lTime) + width]`, sharing `key`. Both inputs must already be
    * projected to disjoint column names apart from `key`. Result
    * carries all columns of both sides.
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      lTime: String,
      rTime: String,
      width: Long): DataFrame = {
    require(width > 0, s"band width must be positive: $width")
    val bin = "__range_bin"
    val lb = left.withColumn(
      bin,
      explode(array(expr(s"$lTime DIV $width"), expr(s"$lTime DIV $width + 1"))))
    val rb = right.withColumn(bin, expr(s"$rTime DIV $width"))
    lb.join(rb, Seq(key, bin))
      .filter(col(rTime) >= col(lTime) && col(rTime) <= col(lTime) + width)
      .drop(bin)
      // a right row exactly on the bin boundary can match the left row's
      // own bin AND its +1 duplicate is a different left-row copy — the
      // equi-join itself never double-counts one (left,right) pair, but
      // distinct-ness is the caller's contract, not this operator's
  }

  /** Self-pair variant: unordered id pairs within the band, each pair
    * once (`id_a < id_b` after least/greatest normalization).
    */
  def bandPairs(
      df: DataFrame,
      key: String,
      time: String,
      id: String,
      width: Long): DataFrame = {
    val a = df.select(col(key), col(time).as("__t_a"), col(id).as("__id_a"))
    val b = df.select(col(key), col(time).as("__t_b"), col(id).as("__id_b"))
    bandJoin(a, b, key, "__t_a", "__t_b", width)
      .filter(col("__id_a") =!= col("__id_b"))
      .select(
        least(col("__id_a"), col("__id_b")).as("id_a"),
        greatest(col("__id_a"), col("__id_b")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }
}
