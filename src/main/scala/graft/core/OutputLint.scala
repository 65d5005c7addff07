package graft.core

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Gate-compatibility lint for registered oracle queries.
  *
  * The driver's correctness harness canonicalizes each result with a
  * pandas row-sort before hashing; array/map/struct cells are unhashable
  * there, so an oracle query that emits one ships `err` in the gate even
  * when the values are exact (the round-7 q86 failure). Every
  * oracle-bearing query must therefore emit primitive columns only —
  * serialize vectors as joined strings or explode them to rows.
  * Enforced in [[graft.Verify]] (the driver path) and in OutputLintSpec
  * (the in-repo path), so the failure class cannot ship again.
  */
object OutputLint {

  private def isScalar(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  /** Names+types of the non-driver-comparable columns, empty if clean. */
  def nonScalarFields(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !isScalar(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
    }

  /** Throws when `schema` carries any array/map/struct column. */
  def assertDriverComparable(name: String, schema: StructType): Unit = {
    val bad = nonScalarFields(schema)
    require(bad.isEmpty,
      s"oracle query $name emits non-scalar output columns " +
        s"(${bad.mkString(", ")}) — the driver's pandas row-sort cannot " +
        "hash array/map/struct cells; serialize them (array_join / " +
        "explode) in both the Spark query and the DuckDB oracle")
  }
}
