package graft

import graft.core.QueryDef

/** Every registered query runs at sf0.001: schema resolves, execution
  * succeeds, and row counts are positive except for queries whose
  * semantics legitimately yield empty results on tiny data.
  */
class QueryPackSpec extends SparkTestBase {

  /** Queries allowed to come back empty at sf0.001. */
  private val mayBeEmpty = Set(
    "q07_anti_join", // every customer may have orders
    "q21_minhash_lsh", // near-dup pairs may not exist at tiny SF
    "q22_jaccard_blocked",
    "q26_embedding_neardup")

  private val allDefs: Seq[QueryDef] = SparkEntry.packs.flatten

  test("registry has no duplicate names and oracle keys are a subset") {
    val names = allDefs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no registered query plans an unpartitioned window") {
    // an empty partitionSpec moves ALL rows to one partition — the
    // silent 100 TB single-task trap. Bounded rank/scan windows must
    // say so with a constant partition key; everything else partitions
    // on a real column.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = allDefs.flatMap { d =>
      val n = d.fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) Some(s"${d.name} ($n)") else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows in: ${offenders.mkString(", ")}")
  }

  allDefs.foreach { d =>
    test(s"${d.name} executes at sf0.001") {
      val df = d.fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(d.name)) {
        assert(n > 0, s"${d.name} returned no rows")
      }
      assert(df.schema.fields.nonEmpty)
    }
  }
}
