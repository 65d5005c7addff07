package graft.avro

import scala.collection.JavaConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.spark.sql.types._

/** E4: StructType ⇄ Avro schema conversion.
  *
  * The reference publishes the reader schema of every outgoing Kafka
  * message and checks schema goldens against it (ref:
  * common/distribution_utils.py:118-124, ztf/test_schema_converter.py:
  * 65-131). spark-avro isn't on this classpath, so the conversion is
  * implemented directly over avro-core: nullable fields become
  * `union(null, T)` with a null default; timestamps map to
  * `long/timestamp-micros`, dates to `int/date`.
  */
object AvroSchemaConverter {

  /** Spark → Avro. `recordName` names the top-level record. */
  def toAvro(dt: DataType, recordName: String = "topLevelRecord",
      namespace: String = "graft"): Schema = {
    def convert(dt: DataType, nullable: Boolean, path: String): Schema = {
      val base: Schema = dt match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case ArrayType(elem, containsNull) =>
          Schema.createArray(convert(elem, containsNull, path + "_item"))
        case MapType(StringType, v, valueContainsNull) =>
          Schema.createMap(convert(v, valueContainsNull, path + "_value"))
        case st: StructType =>
          val fields = st.fields.map { f =>
            new Schema.Field(
              f.name,
              convert(f.dataType, f.nullable, path + "_" + f.name),
              null,
              if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
          }
          Schema.createRecord(path, null, namespace, false, fields.toList.asJava)
        case other =>
          throw new IllegalArgumentException(s"unsupported Spark type for Avro: $other")
      }
      if (nullable && base.getType != Schema.Type.UNION)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
    }
    convert(dt, nullable = false, recordName)
  }

  /** Avro → Spark (inverse; unions of [null, T] become nullable T). */
  def toSql(schema: Schema): DataType = sqlAndNullable(schema)._1

  private[avro] def sqlAndNullable(schema: Schema): (DataType, Boolean) =
    schema.getType match {
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT =>
        if (schema.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
        else (IntegerType, false)
      case Schema.Type.LONG =>
        schema.getLogicalType match {
          case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
            (TimestampType, false)
          case _ => (LongType, false)
        }
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
      case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
      case Schema.Type.ARRAY =>
        val (e, n) = sqlAndNullable(schema.getElementType)
        (ArrayType(e, n), false)
      case Schema.Type.MAP =>
        val (v, n) = sqlAndNullable(schema.getValueType)
        (MapType(StringType, v, n), false)
      case Schema.Type.RECORD =>
        val fields = schema.getFields.asScala.map { f =>
          val (dt, nullable) = sqlAndNullable(f.schema())
          StructField(f.name(), dt, nullable)
        }
        (StructType(fields.toSeq), false)
      case Schema.Type.UNION =>
        val types = schema.getTypes.asScala
        val nonNull = types.filter(_.getType != Schema.Type.NULL)
        val hasNull = types.size != nonNull.size
        nonNull.toList match {
          case single :: Nil =>
            val (dt, n) = sqlAndNullable(single)
            (dt, n || hasNull)
          case _ =>
            throw new IllegalArgumentException(
              s"unsupported non-trivial Avro union: $schema")
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
}
