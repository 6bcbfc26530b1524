package graft.catalog

import org.apache.spark.sql.types._

/** StructType → Hive/Glue catalog column type strings — the reference's
  * GlueSchemaExtractor / HMSSchemaExtractor (xtable-aws
  * GlueSchemaExtractor.java, xtable-hive-metastore HMSSchemaExtractor.java)
  * perform the same internal-schema → catalog-type translation. Both
  * catalogs speak the Hive type grammar: lowercase primitives,
  * `array<...>`, `map<k,v>`, `struct<name:type,...>`.
  */
object CatalogTypes {

  def toHiveType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case a: ArrayType => s"array<${toHiveType(a.elementType)}>"
    case m: MapType =>
      s"map<${toHiveType(m.keyType)},${toHiveType(m.valueType)}>"
    case s: StructType =>
      s.fields.map(f => s"${f.name}:${toHiveType(f.dataType)}")
        .mkString("struct<", ",", ">")
    case other =>
      throw new IllegalArgumentException(s"no catalog type for $other")
  }

  /** Columns in catalog form: (name, hive type), in schema order. */
  def columns(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.map(f => f.name -> toHiveType(f.dataType))
}
