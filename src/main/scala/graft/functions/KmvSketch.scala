package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** k-minimum-values (KMV) distinct sketch as a typed [[Aggregator]] —
  * the engine's custom-UDAF surface (SURVEY §2.14; the reference needs
  * none, this is beyond-parity API coverage).
  *
  * The sketch keeps the k smallest distinct hash values of a group.
  * Memory is O(k) per group regardless of group size, and `merge` is a
  * sorted-merge + truncate — associative and commutative, so Spark can
  * combine partial sketches map-side in any order. From the kth
  * minimum, `(k-1) / u_k` (u_k = the kth value as a [0,1) fraction)
  * estimates the group's distinct count (Bar-Yossef et al. 2002) —
  * the bounded-memory path where an exact countDistinct would carry
  * the whole key set through the shuffle.
  *
  * Inputs are 32-hex md5 strings (lexicographic order == numeric order
  * on the hash), so every retained value — and therefore the estimate —
  * is deterministic and reproducible by any engine with md5: the q136
  * oracle re-derives the identical sketch in DuckDB with a per-group
  * ORDER BY/LIMIT. Ties are impossible below md5-collision scale;
  * duplicate INPUT values are deduplicated on insert (distinct
  * semantics, the property the estimator needs).
  */
class KmvMinHex(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  require(k >= 1)

  override def zero: Seq[String] = Nil

  override def reduce(b: Seq[String], a: String): Seq[String] = insert(b, a)

  override def merge(x: Seq[String], y: Seq[String]): Seq[String] =
    y.foldLeft(x)(insert)

  override def finish(b: Seq[String]): Seq[String] = b

  private def insert(b: Seq[String], v: String): Seq[String] =
    if (v == null || b.contains(v)) b
    else {
      val nb = (b :+ v).sorted
      if (nb.size > k) nb.take(k) else nb
    }

  override def bufferEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object KmvSketch {
  /** Column form: KMV sketch of a 32-hex string column, k minimums. */
  def kmvMinHex(c: Column, k: Int): Column = udaf(new KmvMinHex(k)).apply(c)
}
