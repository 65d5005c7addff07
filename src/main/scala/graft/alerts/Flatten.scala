package graft.alerts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P3/P4: schema-driven flatten + cast + default-fill.
  *
  * The reference probes column existence with try/AnalysisException and
  * back-fills typed defaults (ref: ztf/hbase_utils.py:395-489,
  * common/hbase_utils.py:66-137). Here the same drift tolerance is a
  * principled schema diff: the wanted schema is declared, present
  * columns are cast, missing ones materialize as typed defaults — one
  * `select`, no exception control flow.
  */
object Flatten {

  /** Default literal per type (reference behavior: zeros/empty strings,
    * ref: ztf/hbase_utils.py:443-479).
    */
  def defaultFor(dt: DataType): Column = dt match {
    case StringType => lit("")
    case BooleanType => lit(false)
    case _: NumericType => lit(0).cast(dt)
    case BinaryType => lit(Array.emptyByteArray)
    case _ => lit(null).cast(dt)
  }

  /** Flatten every leaf of nested struct columns into dotted-path flat
    * columns (`candidate.jd` → `candidate_jd`), leaving arrays/maps as
    * opaque values at their level.
    */
  def flattenAll(df: DataFrame, sep: String = "_"): DataFrame = {
    def leaves(prefix: String, dt: DataType): Seq[(String, String)] = dt match {
      case s: StructType =>
        s.fields.flatMap(f => leaves(s"$prefix.${f.name}", f.dataType)).toSeq
      case _ => Seq(prefix -> prefix.replace(".", sep))
    }
    val cols = df.schema.fields.flatMap {
      case StructField(name, s: StructType, _, _) =>
        leaves(name, s).map { case (path, flat) => col(path).as(flat) }
      case StructField(name, _, _, _) => Seq(col(name))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Conform one column to the wanted type, recursively: structs are
    * rebuilt field-by-field (a plain `cast` cannot ADD struct fields),
    * arrays of structs conform element-wise via `transform`, leaves
    * cast. Missing nested fields fill with typed defaults and are
    * recorded as dotted paths. NULL structs/arrays stay NULL.
    */
  private def conformColumn(
      c: Column,
      have: DataType,
      want: DataType,
      path: String,
      missing: scala.collection.mutable.Buffer[String]): Column =
    (have, want) match {
      case (h, w) if h == w => c
      case (h: StructType, w: StructType) =>
        val haveMap = h.fields.map(f => f.name -> f.dataType).toMap
        val fields = w.fields.map { f =>
          haveMap.get(f.name) match {
            case Some(hd) =>
              conformColumn(c.getField(f.name), hd, f.dataType,
                s"$path.${f.name}", missing).as(f.name)
            case None =>
              missing += s"$path.${f.name}"
              defaultFor(f.dataType).as(f.name)
          }
        }
        when(c.isNull, lit(null).cast(w))
          .otherwise(struct(fields.toIndexedSeq: _*))
      case (ArrayType(he, _), ArrayType(we, _)) =>
        transform(c, x => conformColumn(x, he, we, s"$path[]", missing))
      case (_, w) => c.cast(w)
    }

  /** Project `df` onto `wanted`: existing columns conformed to the
    * wanted type (recursively, see [[conformColumn]]), missing columns
    * filled with typed defaults. Extra columns are dropped. Returns the
    * conformed frame plus the (dotted) paths that were missing (the
    * reference logs them; callers decide).
    */
  def conform(df: DataFrame, wanted: StructType): (DataFrame, Seq[String]) = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = scala.collection.mutable.Buffer[String]()
    val cols = wanted.fields.map { f =>
      have.get(f.name) match {
        case Some(hd) =>
          conformColumn(col(f.name), hd, f.dataType, f.name, missing).as(f.name)
        case None =>
          missing += f.name
          defaultFor(f.dataType).as(f.name)
      }
    }
    (df.select(cols.toIndexedSeq: _*), missing.toSeq)
  }

  /** P4 fault-tolerant projection: keep only the requested columns that
    * actually exist (no defaults), reporting the missing ones.
    */
  def selectRelevant(df: DataFrame, names: Seq[String]): (DataFrame, Seq[String]) = {
    val have = df.columns.toSet
    val (present, missing) = names.partition(have.contains)
    (df.select(present.map(col): _*), missing)
  }
}
