package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed selection: the k-th smallest element of a long
  * column WITHOUT a global sort.
  *
  * A total sort of 100 TB to read one order statistic is the classic
  * scale anti-pattern (single total-order exchange, straggler range
  * partitions). Selection by iterative histogram narrowing does it in
  * O(log_B(range)) aggregate-only passes: bin the candidate range into
  * `B` equal-width buckets, count per bucket (map-side combinable, B
  * rows to the driver), descend into the bucket containing the k-th
  * element, repeat until the range collapses. For 64-bit ranges and
  * B = 1024 that is ≤ 7 passes, each a plain groupBy().count() —
  * no shuffle of the data itself, ever (counts move, values don't).
  *
  * The per-pass filter re-reads the source, so pass a cached/cheap
  * DataFrame for iteration-heavy use; the driver holds only B counters.
  */
object DistributedSelect {

  /** Several order statistics in ONE narrowing loop: each round runs a
    * single aggregate pass that histograms every still-active k's
    * candidate range at once (values are tagged (k-index, bin) for
    * each range they fall in, then one (idx, bin) count). For B
    * boundaries that is O(log range) shared passes instead of
    * B·O(log range) independent ones — at 100 TB the difference is B×
    * fewer full scans (the q165 equi-depth histogram reads the data 4
    * times, not 28). */
  def kthSmallestMulti(
      df: DataFrame, c: Column, ks: Seq[Long],
      bins: Int = 1024): Seq[Long] = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val vals = df.select(c.cast("long").as("v")).filter(col("v").isNotNull)
    val head = vals.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n")).head()
    require(!head.isNullAt(0), "kthSmallestMulti on an empty column")
    val n = head.getLong(2)
    require(ks.forall(_ <= n), s"some k in $ks exceeds n=$n")
    // mutable per-k state: candidate range and rank within it
    val lo = Array.fill(ks.length)(head.getLong(0))
    val hi = Array.fill(ks.length)(head.getLong(1))
    val kk = ks.toArray
    while (lo.indices.exists(i => lo(i) < hi(i))) {
      val active = lo.indices.filter(i => lo(i) < hi(i))
      val width = active.map { i =>
        require(hi(i) - lo(i) >= 0, "value span exceeds the signed-Long range")
        i -> ((hi(i) - lo(i)) / bins + 1)
      }.toMap
      // one pass: tag v with (idx, bin) for every active range it is
      // in; integer DIV throughout (double division loses exactness
      // past 2^53)
      val tags = active.map { i =>
        when(col("v") >= lo(i) && col("v") <= hi(i),
          struct(lit(i).as("idx"),
            expr(s"(v - ${lo(i)}L) div ${width(i)}L").as("bin")))
      }
      val hist = vals
        .select(explode(filter(array(tags: _*), x => x.isNotNull)).as("t"))
        .groupBy(col("t.idx").as("idx"), col("t.bin").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .groupBy(_.getInt(0))
      active.foreach { i =>
        val byBin = hist.getOrElse(i, Array.empty)
          .map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
        var acc = 0L
        var chosen = -1L
        byBin.foreach { case (bin, cnt) =>
          if (chosen < 0) {
            if (acc + cnt >= kk(i)) { chosen = bin; kk(i) -= acc }
            else acc += cnt
          }
        }
        lo(i) = lo(i) + chosen * width(i)
        hi(i) = math.min(hi(i), lo(i) + width(i) - 1)
      }
    }
    lo.toSeq
  }

  /** The k-th smallest (1-based) value of `c` (cast to long, nulls
    * dropped). Throws on k < 1 or k > count — the caller owns bounds. */
  def kthSmallest(df: DataFrame, c: Column, k: Long, bins: Int = 1024): Long = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vals = df.select(c.cast("long").as("v")).filter(col("v").isNotNull)
    val head = vals.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n")).head()
    require(!head.isNullAt(0), "kthSmallest on an empty column")
    var lo = head.getLong(0)
    var hi = head.getLong(1)
    require(k <= head.getLong(2), s"k=$k exceeds n=${head.getLong(2)}")
    var kk = k
    while (lo < hi) {
      // ceil-width so bins*width always covers [lo, hi] without the
      // (hi-lo+1) sum overflowing near Long range edges
      val span = hi - lo // >= 1 here
      require(span >= 0, "value span exceeds the signed-Long range")
      val width = span / bins + 1
      // integer DIV, not `/`: Column `/` on longs is DOUBLE division,
      // and doubles lose exactness past 2^53 — fatal for wide spans
      val hist = vals
        .filter(col("v") >= lo && col("v") <= hi)
        .groupBy(expr(s"(v - ${lo}L) div ${width}L").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      var acc = 0L
      var chosen = -1L
      hist.foreach { case (bin, cnt) =>
        if (chosen < 0) {
          if (acc + cnt >= kk) { chosen = bin; kk -= acc }
          else acc += cnt
        }
      }
      lo = lo + chosen * width
      hi = math.min(hi, lo + width - 1)
    }
    lo
  }
}
