package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single latest
  * right row with `right.time <= left.time` sharing the join key.
  *
  * The classic implementations are a per-key sorted merge (native
  * engines) or a correlated subquery (quadratic). Spark-first shape:
  * UNION the two sides with a side tag, one shuffle+sort on
  * (key, time, side), and a running `last(_, ignoreNulls)` window to
  * carry the most recent right payload forward onto each left row.
  * Cost is one exchange + sort over |L|+|R| rows — no join explosion,
  * no per-key driver loop, and AQE-safe at 100 TB because the state per
  * partition is a single running value per payload column.
  *
  * Semantics pinned by the q45 oracle (DuckDB `ASOF LEFT JOIN`):
  *  - inclusive: a right row at exactly left.time matches (the right
  *    side sorts before the left at equal time);
  *  - callers must pre-dedup the right side to one row per (key, time)
  *    — otherwise "the" latest right row is ambiguous in any engine;
  *  - right payload columns must be non-null (null payloads are
  *    indistinguishable from "no match yet" to `last(ignoreNulls)`).
  */
object AsOfJoin {

  /** Shared precondition for both join variants: payload names become
    * output columns and (in nearestJoin) ride `__prior_*`/`__next_*`
    * window temporaries over the unioned frame; a collision with an
    * existing left column, a reserved output/temporary name, or a
    * duplicate within payload would silently shadow data rather than
    * error. Cheap, loud, up-front. */
  private def requireNoCollisions(
      leftCols: Seq[String], payload: Seq[String],
      reserved: Set[String]): Unit = {
    val dupes = payload.diff(payload.distinct).distinct
    val temps = payload.flatMap(p => Seq(s"__prior_$p", s"__next_$p"))
    val bad = payload.filter(p =>
      leftCols.contains(p) || reserved.contains(p)) ++
      leftCols.filter(c => reserved.contains(c) || temps.contains(c)) ++
      dupes
    require(bad.isEmpty,
      s"as-of join: column name collision on ${bad.distinct.mkString(", ")} — " +
        "payload names must be unique and must not match left columns, " +
        "the reserved outputs asof_delta_us/asof_dir, or the " +
        "__prior_*/__next_* temporary namespace")
  }

  /** Left as-of join. `left` keeps all its columns; each `payload`
    * column of `right` is appended (null where no prior right row).
    * `key` and `time` must exist on both sides with identical names.
    */
  def priorJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideTag = "__asof_side"
    requireNoCollisions(leftCols, payload, Set(sideTag))

    val l = left
      .withColumn(sideTag, lit(1))
      .select(
        (Seq(col(key), col(time), col(sideTag)) ++
          leftCols.filterNot(c => c == key || c == time).map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))): _*)
    val r = right
      .withColumn(sideTag, lit(0))
      .select(
        (Seq(col(key), col(time), col(sideTag)) ++
          leftCols.filterNot(c => c == key || c == time)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col)): _*)

    val w = Window
      .partitionBy(key)
      .orderBy(col(time).asc, col(sideTag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried
      .filter(col(sideTag) === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Nearest as-of join with tolerance (pandas `merge_asof
    * direction='nearest'`): for each left row, the right row (same
    * key) whose time is closest within `tolerance` µs — ties break to
    * the PRIOR side. Same single union+sort shape as [[priorJoin]]:
    * the backward candidate rides a `last(ignoreNulls)` over the
    * preceding frame and the forward candidate a `first(ignoreNulls)`
    * over the following frame of the SAME sorted pass, so the whole
    * operator is still one exchange + one sort. A right row at
    * exactly left.time sorts before the left row, lands on the prior
    * side with delta 0, and wins every tie by construction.
    *
    * Appends `payload` columns plus `asof_delta_us` (matched time −
    * left time: ≤ 0 from the prior side, > 0 from the next side) and
    * `asof_dir` ('prior' / 'next' / 'none'). Right must be pre-deduped
    * to one row per (key, time), payloads non-null (as [[priorJoin]]).
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String],
      toleranceUs: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideTag = "__asof_side"
    val rt = "__asof_rt"
    requireNoCollisions(leftCols, payload,
      Set("asof_delta_us", "asof_dir", sideTag, rt))

    val rightT = right.withColumn(rt, col(time))
    val pCols = payload :+ rt
    val l = left
      .withColumn(sideTag, lit(1))
      .select(
        (Seq(col(key), col(time), col(sideTag)) ++
          leftCols.filterNot(c => c == key || c == time).map(col) ++
          pCols.map(p => lit(null).cast(rightT.schema(p).dataType).as(p))): _*)
    val r = rightT
      .withColumn(sideTag, lit(0))
      .select(
        (Seq(col(key), col(time), col(sideTag)) ++
          leftCols.filterNot(c => c == key || c == time)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          pCols.map(col)): _*)

    val order = Window.partitionBy(key)
      .orderBy(col(time).asc, col(sideTag).asc)
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = pCols.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"__prior_$p", last(col(p), ignoreNulls = true).over(back))
        .withColumn(s"__next_$p", first(col(p), ignoreNulls = true).over(fwd))
    }
    val dPrior = col(time) - col(s"__prior_$rt")
    val dNext = col(s"__next_$rt") - col(time)
    val priorOk = col(s"__prior_$rt").isNotNull && dPrior <= toleranceUs
    val nextOk = col(s"__next_$rt").isNotNull && dNext <= toleranceUs
    val usePrior = priorOk && (!nextOk || dPrior <= dNext)
    val dir = when(usePrior, "prior")
      .when(nextOk, "next").otherwise("none")

    val out = payload.foldLeft(carried) { (df, p) =>
      df.withColumn(p,
        when(usePrior, col(s"__prior_$p"))
          .when(nextOk, col(s"__next_$p")))
    }
      .withColumn("asof_delta_us",
        when(usePrior, -dPrior).when(nextOk, dNext))
      .withColumn("asof_dir", dir)
    out
      .filter(col(sideTag) === 1)
      .select((leftCols ++ payload ++
        Seq("asof_delta_us", "asof_dir")).map(col): _*)
  }
}
