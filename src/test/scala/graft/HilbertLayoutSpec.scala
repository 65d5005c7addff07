package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.RangeLayout

/** Hilbert vs Z-order write layout: on the same uniform grid, with a
  * non-power-of-two file count (so range splits cannot align to Morton
  * blocks), Hilbert files must cover a smaller total bounding-box area
  * — contiguous curve ranges are spatially compact, unaligned Morton
  * ranges span the Z jumps. This is the measured claim behind
  * preferring the Hilbert key for multi-column clustering at scale.
  */
class HilbertLayoutSpec extends SparkTestBase {

  private def totalBoxArea(path: String): (Long, Long) = {
    val stats = RangeLayout.boxStats(spark, path, "x", "y")
      .select(
        ((col("max_1") - col("min_1") + 1) *
          (col("max_2") - col("min_2") + 1)).as("area"),
        col("n_rows"))
      .agg(sum("area").as("area"), sum("n_rows").as("rows"))
      .head()
    (stats.getLong(0), stats.getLong(1))
  }

  test("hilbert files cover less box area than z-order files") {
    import spark.implicits._
    val n = 64L
    val grid = (0L until n * n).toDF("i")
      .select((col("i") % n).as("x"), expr("i div 64").as("y"))

    val zDir = Files.createTempDirectory("graft_zlay_").toString + "/t"
    val hDir = Files.createTempDirectory("graft_hlay_").toString + "/t"
    // 12 files: NOT a power of two, so Morton ranges cannot all be
    // aligned quad blocks (aligned splits would hide the Z jumps)
    RangeLayout.writeZOrdered(grid, "x", "y", 6, 12, zDir)
    RangeLayout.writeHilbertOrdered(grid, "x", "y", 6, 12, hDir)

    val (zArea, zRows) = totalBoxArea(zDir)
    val (hArea, hRows) = totalBoxArea(hDir)
    assert(zRows === n * n && hRows === n * n)
    assert(hArea < zArea,
      s"expected Hilbert boxes tighter than Z-order: h=$hArea z=$zArea")
    // and both are far better than a round-robin scatter, whose every
    // file spans ~the whole domain (~12 * 4096)
    assert(hArea < 3 * n * n,
      s"Hilbert total box area should stay near the cell count: $hArea")
  }
}
