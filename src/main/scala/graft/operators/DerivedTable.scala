package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialization of a derived artifact shared by
  * several queries — the amortized-index discipline (ref
  * `bin/ztf/archive_index.py:47-300`: derive once, serve many) applied
  * to mid-pipeline artifacts instead of archive tables.
  *
  * Several graph queries derive the SAME similarity-pair table from
  * the corpus (a full gram pass + posting self-join, the dominant cost
  * of each); with per-query `persist()` the pass is still re-paid per
  * query because harness embedders clear the cache between queries.
  * [[getOrBuild]] instead writes the artifact ONCE per (warehouse,
  * dataset) as a managed parquet table and hands every later caller a
  * plain scan of it. At 100 TB this converts k full-corpus passes per
  * suite into one; the artifact itself is skinny int64 pairs bounded
  * by the df cap.
  *
  * The table name carries a hash of (dataset path, dataset CONTENT
  * fingerprint, build version): different SF dirs coexist, and a
  * committed leftover can never be resurrected against regenerated
  * data (the fingerprint folds every file's length+mtime — listing is
  * a metadata-only O(#files) walk, free next to the build itself) or
  * against a changed derivation (callers bump their `version` whenever
  * the build logic changes semantics). The warehouse dir is pid-scoped
  * (GraftSession), so even a fingerprint collision after PID reuse
  * would need identical (path, sizes, mtimes) to be trusted.
  * Correctness contract: `build` must be a PURE function of the
  * dataset dir — the cache is invisible to results, only to cost
  * (Round11Spec asserts both; Round12Spec asserts the fingerprint
  * and version sensitivity).
  */
object DerivedTable {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Number of cache-miss builds this JVM has paid — observable so
    * tests can assert the build really is amortized. */
  val builds = new AtomicInteger(0)

  // per-(artifact, dataset) locks: concurrent builds of DIFFERENT
  // artifacts must not serialize on each other (a corpus-sized build
  // can take seconds), and concurrent first callers of the SAME
  // artifact must serialize so exactly one of them builds
  private val locks = new ConcurrentHashMap[String, Object]()

  /** Sorted (path, length, mtime) of every file under `dir` — the
    * dataset content fingerprint. Metadata-only (no bytes read) and
    * resolved through the Hadoop FileSystem API, so a dataset on
    * HDFS/S3 fingerprints exactly like a local one (a java.io.File
    * walk would silently see nothing there and degrade the key back
    * to path-only — the staleness hole this exists to close).
    *
    * Memoized per path for the JVM's lifetime: one listing per
    * dataset per session, not one per consumer-query invocation (a
    * recursive LIST of a large S3 prefix on every cache HIT would
    * cost more than the artifact saves). The staleness this guards
    * against — a dataset regenerated at the same path — happens
    * BETWEEN sessions, never mid-session (datasets are immutable
    * while a session runs); a test that mutates its fixture dataset
    * in-JVM calls [[refreshFingerprints]] first.
    *
    * Known residual gap, accepted and documented: a replacement that
    * preserves file names, lengths, AND mtimes (rsync -t / tar -p /
    * distcp -p restoring a same-shaped snapshot) fingerprints
    * identically while the bytes differ — closing it would mean
    * reading data bytes per call. The pid-scoped warehouse bounds the
    * blast radius to one JVM's lifetime. */
  private val fpMemo = new ConcurrentHashMap[String, String]()

  /** Drop memoized dataset fingerprints — for tests that regenerate a
    * fixture dataset at the same path within one JVM. */
  private[graft] def refreshFingerprints(): Unit = fpMemo.clear()

  private def fingerprint(spark: SparkSession, dir: Path): String =
    fpMemo.computeIfAbsent(dir.toString, _ => {
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) "absent"
      else {
        val it = fs.listFiles(dir, true /* recursive */)
        val entries = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val s = it.next()
          entries += s"${s.getPath.toUri.getPath}|${s.getLen}|" +
            s"${s.getModificationTime}"
        }
        entries.sorted.mkString("\n")
      }
    })

  private def tableName(
      spark: SparkSession, artifact: String, datasetDir: String,
      version: Int): String = {
    // canonicalize bare local paths (resolves symlinks/..); a dataset
    // dir that is already a URI (hdfs://, s3a://) passes through
    val dir =
      if (datasetDir.contains("://")) new Path(datasetDir)
      else new Path(new java.io.File(datasetDir).getCanonicalPath)
    val key = s"$dir v$version " + fingerprint(spark, dir)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"g_derived_${artifact}_$h"
  }

  /** Return the materialized `artifact` for `datasetDir`, building it
    * with `build` on first use in this session. Thread-safe per key:
    * parallel first callers of one artifact serialize on its build;
    * unrelated artifacts proceed concurrently. Bump `version` whenever
    * the build derivation changes semantics — it is part of the
    * artifact identity, so an old on-disk artifact is never served to
    * new code.
    *
    * The dataset content fingerprint is memoized per session (see
    * [[fpMemo]]); if you mutate a dataset in-place within one JVM
    * (test fixtures, or an mtime/length-preserving replacement like
    * `rsync -t`), call [[refreshFingerprints]] before the next
    * getOrBuild or a stale artifact will be served for the JVM's
    * lifetime. Each cache-miss build logs its resolved table name —
    * the fingerprint hash is in the name — so a suspected stale-serve
    * incident is diagnosable from the run log. */
  def getOrBuild(
      spark: SparkSession,
      artifact: String,
      datasetDir: String,
      version: Int = 1)(build: => DataFrame): DataFrame = {
    val tbl = tableName(spark, artifact, datasetDir, version)
    val lock = locks.computeIfAbsent(tbl, _ => new Object)
    lock.synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        // another SparkSession in this JVM (fresh in-memory catalog,
        // same pid warehouse) may have produced the location already.
        // A COMPLETE artifact (committed _SUCCESS) is byte-identical
        // by the purity contract — REGISTER it rather than delete it
        // out from under the sibling session's live scans; only an
        // uncommitted leftover (crashed build) is cleared and rebuilt.
        val loc =
          new Path(spark.conf.get("spark.sql.warehouse.dir"), tbl)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new Path(loc, "_SUCCESS"))) {
          // only an UNCOMMITTED leftover (crashed build) is cleared;
          // the parquet write commits _SUCCESS atomically at the end
          fs.delete(loc, true)
          build.write.mode("overwrite").parquet(loc.toString)
          builds.incrementAndGet()
          // the table name embeds the (path, content-fingerprint,
          // version) hash — logging it per build makes a stale-serve
          // incident (see fpMemo's documented rsync -t gap)
          // diagnosable from the run log after the fact
          log.info(s"built artifact $tbl for $datasetDir v$version")
        }
        // register as an EXTERNAL table over the committed location:
        // a DROP TABLE (or a sibling session that never saw the
        // catalog entry) can then never delete the data under a
        // session still scanning it
        spark.catalog.createTable(tbl, loc.toString, "parquet")
      }
    }
    spark.table(tbl)
  }
}
