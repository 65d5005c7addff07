package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitter summary as a typed [[Aggregator]] — the
  * frequency companion to [[KmvMinHex]]'s distinct sketch on the
  * engine's custom-UDAF surface (SURVEY §2.14).
  *
  * Tracks at most k (item, counter) pairs in O(k) memory per group.
  * Guarantees (Misra & Gries 1982): every item with true frequency
  * > N/(k+1) survives, and a reported counter underestimates the true
  * count by at most N/(k+1). The merge rule (Agarwal et al. 2013,
  * "Mergeable Summaries") adds counters pairwise, then subtracts the
  * (k+1)-th largest counter and drops non-positive entries — the
  * result keeps the summed error bound, so Spark may combine partial
  * sketches map-side in ANY order.
  *
  * Unlike KMV, the retained state depends on encounter order, so there
  * is no cross-engine oracle row for the raw sketch; the evidence is
  * the GUARANTEE: MisraGriesProperties drives arbitrary streams and
  * partition splits through reduce/merge and asserts survival + the
  * error bound. (q137 computes exact heavy hitters for the gate; this
  * aggregator is the bounded-memory path for when the key domain
  * itself cannot be shuffled.)
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, "MisraGries needs k >= 1 tracked slots")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    if (x == null) b
    else if (b.contains(x)) b.updated(x, b(x) + 1L)
    else if (b.size < k) b.updated(x, 1L)
    else
      // classic decrement-all step; zeros vacate their slots and the
      // incoming item is absorbed into the shared error budget
      b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1L)) else None }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (i, c) =>
        if (c - cut > 0) Some(i -> (c - cut)) else None
      }
    }
  }

  /** Deterministic presentation: counters descending, item ascending. */
  def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (i, c) => (-c, i) }

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object MisraGries {
  /** Column form: heavy-hitter summary of a string key column;
    * output is array<struct<_1: item, _2: lower-bound count>> sorted
    * by count descending. */
  def heavyHitters(c: Column, k: Int): Column = udaf(new MisraGries(k)).apply(c)
}
