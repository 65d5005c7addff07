package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group top-k as a typed mergeable [[Aggregator]] — the
  * bounded-memory alternative to `row_number() OVER (...) <= k`.
  *
  * A rank window ships EVERY row of every group through the shuffle
  * and sorts it; this aggregator keeps an O(k) buffer per group, so
  * partial aggregation combines map-side and only ≤ k rows per group
  * per partition reach the exchange — at 100 TB the difference
  * between shuffling the fact table and shuffling k·|groups| rows.
  * `merge` is a sorted-merge + truncate: associative and commutative,
  * so Spark may combine partials in any order (the plan shows
  * ObjectHashAggregate partial/final, no Window, no full sort).
  *
  * Ordering is (value DESC, id ASC) — the id tiebreak makes the
  * retained set and its order deterministic, so results are
  * oracle-exact cross-engine (q297 replays the same ORDER BY in
  * DuckDB's rank window).
  */
class TopKLongPairs(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1)

  /** (value, id) beats (value', id') on value DESC then id ASC. */
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.size >= k && !beats(a, b.last)) b
    else ((b :+ a).sortWith(beats)).take(k)

  override def merge(
      x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (x ++ y).sortWith(beats).take(k)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopK {
  /** Column form: top-k (value, id) pairs, value DESC / id ASC.
    * Returns array<struct<_1: value, _2: id>> in rank order. */
  def topkLong(value: Column, id: Column, k: Int): Column =
    udaf(new TopKLongPairs(k), ExpressionEncoder[(Long, Long)]())
      .apply(value, id)
}
