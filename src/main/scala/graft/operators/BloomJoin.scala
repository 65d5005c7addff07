package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.xxhash64

import graft.functions.BloomSketch

/** Explicit runtime-filter join prefilter (SURVEY §2 Y-rows company):
  * build a Bloom bitmap from the (already filtered) build side's keys,
  * push a `bloom_might_contain` predicate onto the probe side, then
  * run the exact join as usual.
  *
  * WHY: when a selective dimension filter survives only f≪1 of the
  * build keys, the plain plan still shuffles 100% of the probe side
  * into the join. The bloom prefilter drops (1-f)·(1-FPR) of probe
  * rows AT THE SCAN, before the exchange — at 100 TB that's the
  * difference between shuffling 100 TB and shuffling f·100 TB. Spark's
  * own InjectRuntimeFilter makes the same move behind a size
  * heuristic; this operator makes it explicit and tunable (bitmap
  * bits, probe count), for the cases the heuristic declines.
  *
  * CORRECTNESS: the bitmap has no false negatives, so prefilter+join
  * returns exactly the plain join's rows (false positives die in the
  * join) — the q197 oracle is therefore the PLAIN SQL join.
  *
  * SCALE CONTRACT: one extra pass over the BUILD side (the small,
  * filtered one) plus one driver-held bitmap of numBits/8 bytes
  * (default 128 KiB) — independent of build-side row count. Size
  * numBits ≈ 10–40 bits per expected distinct build key: FPR for k=4
  * at 16 bits/key is <0.3%. The `collect` is ONE row of bitmap bytes —
  * bounded by construction, never by data volume. Both sides hash
  * their key CAST TO LONG so build and probe agree bit-for-bit.
  */
object BloomJoin {
  /** Returns `probe` filtered to rows whose `probeKey` might appear in
    * `build`'s `buildKey` set. Compose with the exact join afterwards. */
  def prefilter(
      probe: DataFrame,
      probeKey: Column,
      build: DataFrame,
      buildKey: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = 4): DataFrame = {
    val bitmap = build
      .select(BloomSketch.bloomAgg(
        xxhash64(buildKey.cast("long")), numBits, numHashes).as("bm"))
      .head().getAs[Array[Byte]]("bm")
    probe.filter(
      BloomSketch.mightContain(bitmap, xxhash64(probeKey.cast("long")), numHashes))
  }
}
