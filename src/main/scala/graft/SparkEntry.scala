package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator packs register here. Each [[graft.core.QueryDef]] is one
  * implemented operator from SURVEY.md §2 (or a beyond-parity
  * LLM-pipeline operator); `oracle = Some(sql)` entries are checked
  * value-for-value against DuckDB by the driver, the rest get a
  * rows-only check plus their own ScalaTest.
  */
object SparkEntry {

  /** Every registered pack, in evaluation order. */
  def packs: Seq[Seq[QueryDef]] = Seq(
    graft.queries.Relational.defs,
    graft.queries.Extended.defs,
    graft.queries.TextAnalysis.defs,
    graft.queries.Dedup.defs,
    graft.queries.Similarity.defs,
    graft.queries.Nested.defs,
    graft.queries.Spatial.defs,
    graft.queries.Temporal.defs,
    graft.queries.Layout.defs,
    graft.queries.Corpus.defs,
    graft.queries.Reports.defs,
    graft.queries.Curation.defs,
    graft.queries.Serving.defs,
    graft.queries.Cleaning.defs,
    graft.queries.Validation.defs,
    graft.queries.Media.defs,
    graft.queries.Graph.defs,
  )

  private lazy val allDefs: Seq[QueryDef] = packs.flatten

  /** Flagship: the ASIA-revenue star join (q05) on sf0.001 — exercises
    * scan, broadcast dim joins, a fact-fact shuffle join and aggregation
    * in one plan. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val q05 = allDefs.find(_.name == "q05_star_join").get
    q05.fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Caching contract (see [[graft.core.QueryDef]]): a few queries
    * persist() an intermediate the returned DataFrame references —
    * call `spark.catalog.clearCache()` after consuming each result,
    * as Bench/Verify do. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
