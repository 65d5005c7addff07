package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-range-sorted lake layout: `repartitionByRange` +
  * `sortWithinPartitions` on the layout column so every output file
  * covers a (near-)disjoint value range — the 1-D companion to the
  * z-order key (queries/Validation.scala q133). With disjoint files,
  * parquet footer min/max stats prune a time-range scan to the files
  * that can match, which is the property the reference gets from hive
  * y/m/d partitioning (`bin/ztf/merge.py:62-91`, layout Y1) — range
  * sorting provides it WITHIN a partition grain, where hive
  * partitioning would explode the directory count.
  *
  * At 100 TB: `repartitionByRange` samples the column to pick balanced
  * boundaries (one pass + one range shuffle), so file sizes stay even
  * under time skew; the audit reads footer-sized stats per file, never
  * data pages.
  */
object RangeLayout {

  /** Write `df` range-partitioned and sorted by `c` into `nFiles`
    * files. */
  def writeSorted(df: DataFrame, c: String, nFiles: Int, path: String): Unit =
    df.repartitionByRange(nFiles, col(c))
      .sortWithinPartitions(col(c))
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max, rows) of `c` — the layout audit table. One
    * column scan grouped by `input_file_name`; row count = file count,
    * so the result is always collect-safe. */
  def fileStats(spark: SparkSession, path: String, c: String): DataFrame =
    spark.read.parquet(path)
      .select(col(c).as("v"), input_file_name().as("file"))
      .groupBy("file")
      .agg(min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Two-dimensional layout: write range-partitioned and sorted by the
    * z-order (Morton) interleave of two grid-scaled dimensions — the
    * WRITE path for q133's layout key (queries/Validation.scala): with
    * the curve key as the file order, every file's (c1, c2) bounding
    * box stays near-square instead of spanning the full second
    * dimension, so parquet min/max stats prune scans filtered on
    * EITHER dimension. Domain maxima come from one tiny aggregate
    * (broadcast back); everything else is per-row bit math + one range
    * shuffle.
    */
  /** Collect-and-validate the (max_1, max_2) domain of the two layout
    * dimensions — one row, driver-safe. The grid normalization
    * `c * grid div (max + 1)` multiplies BEFORE dividing, so a
    * negative key or a max within `grid` of Long.MaxValue would
    * silently overflow and scatter rows into arbitrary curve cells
    * (layout quality lost, data preserved). Reject both domains
    * up front instead. */
  /** bits = 0 makes grid = 1, which turns the overflow guard
    * `max1 <= Long.MaxValue / grid` vacuous: max1 = Long.MaxValue
    * passes, then `max1 + 1` in the normalization expression wraps to
    * Long.MinValue and the layout silently degenerates instead of
    * erroring. bits > 31 would overflow the 2-D interleave (2·bits
    * key bits must fit a Long). Reject both before grid math. */
  private def requireBits(bits: Int): Unit =
    require(bits >= 1 && bits <= 31,
      s"curve layout: bits must be in [1, 31] (got $bits)")

  private def gridDomain(
      df: DataFrame, c1: String, c2: String, grid: Long): (Long, Long) = {
    // count(*) vs count(col) rides the SAME one-row aggregate, so the
    // per-row null check costs nothing extra: min/max silently skip
    // nulls, and a null key would otherwise slip past the guard and
    // land in an arbitrary curve cell
    val row = df.agg(
      min(col(c1)).cast("long").as("min_1"),
      max(col(c1)).cast("long").as("max_1"),
      min(col(c2)).cast("long").as("min_2"),
      max(col(c2)).cast("long").as("max_2"),
      count(lit(1)).as("n"),
      count(col(c1)).as("n1"),
      count(col(c2)).as("n2")).head()
    val n = row.getLong(4)
    require(n > 0, "curve layout: empty input")
    require(row.getLong(5) == n && row.getLong(6) == n,
      s"curve layout: null keys in $c1/$c2 " +
        s"(${n - row.getLong(5)}/${n - row.getLong(6)} of $n rows) — " +
        "filter or default-fill them before layout")
    val (min1, max1, min2, max2) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    require(min1 >= 0 && min2 >= 0,
      s"curve layout: keys must be non-negative (got min($c1)=$min1, " +
        s"min($c2)=$min2) — shift the domain before layout")
    require(max1 <= Long.MaxValue / grid && max2 <= Long.MaxValue / grid,
      s"curve layout: max($c1)=$max1 / max($c2)=$max2 too large for a " +
        s"$grid-cell grid — `key * grid` would overflow Long; rescale " +
        "the keys first")
    (max1, max2)
  }

  def writeZOrdered(
      df: DataFrame, c1: String, c2: String, bits: Int, nFiles: Int,
      path: String): Unit = {
    requireBits(bits)
    val grid = 1L << bits
    val (max1, max2) = gridDomain(df, c1, c2, grid)
    val z = graft.queries.Validation.morton(
      expr(s"$c1 * $grid div ${max1 + 1}"),
      expr(s"$c2 * $grid div ${max2 + 1}"), bits)
    df.withColumn("zkey", z)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Two-dimensional layout, Hilbert variant: identical write path to
    * [[writeZOrdered]] but keyed by the Hilbert curve distance
    * ([[graft.functions.HilbertCurve]]). Consecutive curve positions
    * are adjacent cells (no Z-shape jumps), so contiguous key ranges —
    * which is exactly what each output file holds — cover tighter
    * (c1, c2) boxes than Morton order; HilbertLayoutSpec measures the
    * box-area win on a uniform grid. Same cost profile: one tiny
    * domain aggregate, per-row integer bit walk, one range shuffle.
    */
  def writeHilbertOrdered(
      df: DataFrame, c1: String, c2: String, bits: Int, nFiles: Int,
      path: String): Unit = {
    requireBits(bits)
    val grid = 1L << bits
    val (max1, max2) = gridDomain(df, c1, c2, grid)
    val h = graft.functions.HilbertCurve.hilbert(
      expr(s"$c1 * $grid div ${max1 + 1}"),
      expr(s"$c2 * $grid div ${max2 + 1}"), bits)
    df.withColumn("hkey", h)
      .repartitionByRange(nFiles, col("hkey"))
      .sortWithinPartitions(col("hkey"))
      .drop("hkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file bounding boxes of two layout dimensions plus the mean
    * box area as a fraction of the domain — the 2-D pruning audit
    * (smaller boxes ⇒ more files skipped by a predicate on either
    * dimension). */
  def boxStats(spark: SparkSession, path: String, c1: String, c2: String)
      : DataFrame =
    spark.read.parquet(path)
      .select(col(c1).as("v1"), col(c2).as("v2"),
        input_file_name().as("file"))
      .groupBy("file")
      .agg(min("v1").as("min_1"), max("v1").as("max_1"),
        min("v2").as("min_2"), max("v2").as("max_2"),
        count(lit(1)).as("n_rows"))

  /** Clustering depth: the maximum number of files whose [min,max]
    * interval covers a single point — 1 means perfectly disjoint
    * (every range scan touches the minimum possible file set); a
    * round-robin layout degenerates to ~fileCount. Driver-side sweep
    * over the audit table — bounded by the file count by construction.
    */
  def overlapDepth(stats: DataFrame): Int = {
    val events = stats.select("min_v", "max_v").collect()
      .flatMap(r => Seq((BigDecimal(r.get(0).toString), 1),
        (BigDecimal(r.get(1).toString), -1)))
      // closed intervals: at equal coordinates the +1 sorts first so a
      // shared endpoint counts as overlap
      .sortBy { case (v, delta) => (v, -delta) }
    var depth = 0
    var best = 0
    events.foreach { case (_, delta) =>
      depth += delta
      if (depth > best) best = depth
    }
    best
  }
}
