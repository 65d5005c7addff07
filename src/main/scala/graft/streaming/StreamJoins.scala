package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J3 stream-stream join (the reference delegates its ZTF×GCN
  * multimessenger join to a sub-package, ref: ztf/mm_utils.py:207-219;
  * here it is first-class): watermarked event-time interval join, the
  * only correct shape for unbounded×unbounded state.
  */
object StreamJoins {

  /** Inner join of two streams on `key`, with event-time columns bounded
    * to |tA − tB| ≤ `withinSecs` and state bounded by `watermark` (e.g.
    * "30 seconds"). Column names of `right` must be disjoint from
    * `left` except the key.
    */
  def eventTimeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      watermark: String,
      withinSecs: Long): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(
      r,
      l(key) === r(key) &&
        r(rightTime) >= l(leftTime) - expr(s"INTERVAL $withinSecs seconds") &&
        r(rightTime) <= l(leftTime) + expr(s"INTERVAL $withinSecs seconds"))
      .drop(r(key))
  }
}
