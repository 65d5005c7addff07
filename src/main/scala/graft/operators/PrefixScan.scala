package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordered prefix sum — the two-level scan.
  *
  * `SUM(x) OVER (ORDER BY k)` with an empty PARTITION BY moves every
  * row through ONE task: the silent 100 TB single-partition trap this
  * repo's QueryPackSpec lint exists to catch. The classic parallel
  * alternative is a two-level scan:
  *
  *   1. band rows by broadcast disc-percentile cuts of the order key
  *      (any two rows with k_a < k_b land in band_a <= band_b; equal
  *      keys share a band, so banding is consistent with the order);
  *   2. run the prefix window WITHIN each band — a partitioned window,
  *      `nBands`-way parallel;
  *   3. collect the `nBands` band totals (bounded by construction),
  *      fold them to per-band offsets on the driver, broadcast back;
  *   4. global prefix = band offset + within-band prefix.
  *
  * Exactness: int64 arithmetic end to end; the full order (key +
  * caller-supplied tiebreakers) is applied inside each band, and band
  * boundaries only ever split between DIFFERENT key values, so the
  * result equals the single-partition window row for row — q271's
  * DuckDB oracle (a plain global window) certifies exactly that
  * equality at whole-result grain.
  */
object PrefixScan {

  /** Appends `cumCol` = running sum of `valueCol` over the global
    * order (`orderKeyCol` ASC, then `tieCols` ASC), plus the banding
    * column `bandCol` (kept for plan tests; drop it if unwanted).
    *
    * `orderKeyCol` must be a LONG column expression; `valueCol` long.
    * For descending order pass a negated key. `df` is scanned twice
    * (cut aggregate + the banded pass) — cache upstream if it is
    * expensive to recompute.
    */
  def runningSum(
      df: DataFrame, orderKeyCol: String, tieCols: Seq[String],
      valueCol: String, cumCol: String, nBands: Int = 32,
      bandCol: String = "scan_band"): DataFrame =
    runningSums(df, orderKeyCol, tieCols, Seq(valueCol -> cumCol),
      nBands, bandCol)

  /** Several running sums over the SAME global order in one banded
    * pass — N scans for the price of one (one cut aggregate, one
    * window stage, one bounded totals collect). `cols` maps each
    * value column to its output cumulative-column name. */
  def runningSums(
      df: DataFrame, orderKeyCol: String, tieCols: Seq[String],
      cols: Seq[(String, String)], nBands: Int = 32,
      bandCol: String = "scan_band"): DataFrame = {
    require(nBands >= 2, s"nBands must be >= 2: $nBands")
    require(cols.nonEmpty, "at least one (value, cum) pair required")
    // 1. band cuts: nBands-1 percentiles of the order key in ONE
    //    exact `percentile(key, array(..))` aggregate. (The previous
    //    form ran nBands-1 separate percentile_disc sort-aggregates —
    //    31 independent buffers over the full input, the dominant
    //    cost of the whole scan at sf0.1.) Interpolated values cast
    //    to long are equally valid cuts: banding by `key > cut` is
    //    correct for ANY cut set — equal keys always land in the same
    //    band, and cut quality only affects balance, not the result.
    val probs = (1 until nBands).map(_.toDouble / nBands).mkString(", ")
    // cuts collected ONCE and inlined as a literal array (bounded by
    // nBands — the bounded-collect contract that already governs the
    // band totals below). The previous broadcast-crossJoin form
    // re-computed the percentile aggregate inside EVERY action over
    // the banded frame — the totals collect AND the caller's own
    // action each paid the full-input percentile plus a
    // BroadcastNestedLoopJoin; the literal makes banding a pure
    // projection (r14).
    val cuts: Seq[Long] = Option(
      df.agg(
        expr(s"transform(percentile($orderKeyCol, array($probs)), " +
          "x -> CAST(x AS BIGINT))").as("cuts"))
        .head().getSeq[Long](0)).getOrElse(Seq.empty)
    val banded = df
      .withColumn(bandCol,
        size(filter(typedLit(cuts), c => col(orderKeyCol) > c)).cast("long"))
    // 2. within-band prefix sums under the full total order — all N
    //    value columns ride ONE window operator over one sort
    val w = Window.partitionBy(bandCol)
      .orderBy((orderKeyCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cols.zipWithIndex.foldLeft(banded) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"scan_local_$i", sum(col(v)).over(w))
    }
    // 3. band totals -> exclusive offsets; <= nBands rows by
    //    construction, the bounded-collect contract. Aggregated over
    //    `banded`, NOT `local`: the per-band totals sum the RAW value
    //    columns, so running this action over the windowed frame made
    //    the collect pay the within-band sort + window a second time
    //    for nothing (r13 — the window now executes once, in the
    //    caller's own action).
    val totals = banded.groupBy(bandCol)
      .agg(cols.zipWithIndex.map { case ((v, _), i) =>
        sum(col(v)).as(s"t_$i") }.head,
        cols.zipWithIndex.tail.map { case ((v, _), i) =>
          sum(col(v)).as(s"t_$i") }: _*)
      .collect()
      .map(r => r.getLong(0) -> cols.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val offsetRows = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(cols.indices.map(_ => 0L)) {
        (acc, t) => acc.zip(t).map { case (a, b) => a + b }
      }.dropRight(1))
    // 4. global prefix = offset(band) + local prefix, per column
    cols.zipWithIndex.foldLeft(local) {
      case (acc, ((_, cum), i)) =>
        val offExpr = offsetRows.foldLeft(lit(0L)) {
          case (e, (b, offs)) =>
            when(col(bandCol) === b, lit(offs(i))).otherwise(e)
        }
        acc.withColumn(cum, offExpr + col(s"scan_local_$i"))
          .drop(s"scan_local_$i")
    }
  }
}
