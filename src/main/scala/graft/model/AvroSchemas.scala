package graft.model

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.spark.sql.types._

/** Avro ⇄ Spark schema conversion — reference AvroSchemaConverter.java:76-489
  * (Hudi's native schema language). Covers records, nullable unions,
  * enums (→ string, values kept in metadata), fixed (→ binary, size in
  * metadata), arrays, maps, and the logical types date /
  * timestamp-millis / timestamp-micros / decimal / uuid.
  */
object AvroSchemas {
  val EnumValuesKey = "graft.enumValues"
  val FixedSizeKey = "graft.fixedSize"
  val UuidKey = "graft.logicalType"
  /** "millis" | "micros" — Spark's TimestampType is always micros
    * internally, but an Avro-origin schema must re-export with its ORIGINAL
    * precision or a round-trip silently widens the logical type (reference
    * InternalSchema.java:68-82 models the same metadata).
    */
  val TimestampPrecisionKey = "graft.timestampPrecision"

  // ---- Avro → Spark ----

  def toSpark(schema: Schema): DataType = schema.getType match {
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.map { f =>
        val (dt, nullable) = fieldType(f.schema())
        StructField(f.name(), dt, nullable, metadataFor(f.schema()))
      }.toSeq)
    case _ => fieldType(schema)._1
  }

  private def metadataFor(s: Schema): Metadata = {
    val inner = unwrapNullable(s)._1
    val b = new MetadataBuilder()
    inner.getType match {
      case Schema.Type.ENUM =>
        b.putStringArray(EnumValuesKey,
          inner.getEnumSymbols.asScala.toArray)
      case Schema.Type.FIXED if inner.getLogicalType == null =>
        b.putLong(FixedSizeKey, inner.getFixedSize.toLong)
      case Schema.Type.STRING
        if inner.getLogicalType != null &&
          inner.getLogicalType.getName == "uuid" =>
        b.putString(UuidKey, "uuid")
      case Schema.Type.LONG
        if inner.getLogicalType != null &&
          inner.getLogicalType.getName.endsWith("-millis") =>
        b.putString(TimestampPrecisionKey, "millis")
      case _ =>
    }
    b.build()
  }

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      val nullable = nonNull.size < s.getTypes.size()
      if (nonNull.size == 1) (nonNull.head, nullable)
      else throw new IllegalArgumentException(
        s"non-nullable unions unsupported: $s")
    } else (s, false)

  private def fieldType(s: Schema): (DataType, Boolean) = {
    val (inner, nullable) = unwrapNullable(s)
    val dt = Option(inner.getLogicalType).map(_.getName) match {
      case Some("date") => DateType
      case Some("timestamp-millis") | Some("timestamp-micros") => TimestampType
      case Some("local-timestamp-millis") | Some("local-timestamp-micros") =>
        TimestampNTZType
      case Some("decimal") =>
        val d = inner.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
        DecimalType(d.getPrecision, d.getScale)
      case Some("uuid") => StringType
      case _ => inner.getType match {
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.INT => IntegerType
        case Schema.Type.LONG => LongType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
        case Schema.Type.ENUM => StringType
        case Schema.Type.RECORD => toSpark(inner)
        case Schema.Type.ARRAY =>
          val (et, en) = fieldType(inner.getElementType)
          ArrayType(et, en)
        case Schema.Type.MAP =>
          val (vt, vn) = fieldType(inner.getValueType)
          MapType(StringType, vt, vn)
        case Schema.Type.NULL => NullType
        case other => throw new IllegalArgumentException(s"avro type $other")
      }
    }
    (dt, nullable)
  }

  // ---- Spark → Avro ----

  def fromSpark(schema: StructType, recordName: String = "record"): Schema = {
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name,
        maybeNullable(avroType(f.dataType, f.metadata, s"${recordName}_${f.name}"),
          f.nullable),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def maybeNullable(s: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s

  private def avroType(dt: DataType, meta: Metadata, name: String): Schema =
    dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType if meta.contains(UuidKey) =>
        LogicalTypes.uuid().addToSchema(Schema.create(Schema.Type.STRING))
      case StringType if meta.contains(EnumValuesKey) =>
        Schema.createEnum(s"${name}_enum", null, "graft",
          meta.getStringArray(EnumValuesKey).toList.asJava)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType if meta.contains(FixedSizeKey) =>
        Schema.createFixed(s"${name}_fixed", null, "graft",
          meta.getLong(FixedSizeKey).toInt)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        val lt = if (meta.contains(TimestampPrecisionKey) &&
            meta.getString(TimestampPrecisionKey) == "millis")
          LogicalTypes.timestampMillis() else LogicalTypes.timestampMicros()
        lt.addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        val lt = if (meta.contains(TimestampPrecisionKey) &&
            meta.getString(TimestampPrecisionKey) == "millis")
          LogicalTypes.localTimestampMillis()
        else LogicalTypes.localTimestampMicros()
        lt.addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case a: ArrayType =>
        Schema.createArray(maybeNullable(
          avroType(a.elementType, Metadata.empty, name), a.containsNull))
      case m: MapType =>
        Schema.createMap(maybeNullable(
          avroType(m.valueType, Metadata.empty, name), m.valueContainsNull))
      case s: StructType => fromSpark(s, name)
      case other => throw new IllegalArgumentException(s"spark type $other")
    }
}
