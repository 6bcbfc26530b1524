package graft.formats.iceberg

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.types._

import graft.util.Jsons

/** StructType ⇄ Iceberg schema JSON (spec: iceberg.apache.org/spec/#schemas)
  * with stable field-id assignment — the reference's IcebergSchemaExtractor
  * (IcebergSchemaExtractor.java:66-158) does the same id bookkeeping via its
  * tracker; we persist assigned ids in StructField metadata under
  * `graft.fieldId` so re-syncs keep ids stable (rename-safe evolution).
  */
object IcebergSchemas {
  val FieldIdKey = "graft.fieldId"

  /** Evolve `incoming` against `current`: fields that exist in the current
    * schema (by dotted name) keep their ids; only genuinely new fields get
    * fresh ids past the current maximum — the reference's fieldId-keyed
    * ordered evolution (IcebergSchemaSync.java:50-197). Without this, an
    * id-less source adding a middle column would shift every later id and
    * corrupt stats/pruning on historical files.
    */
  def evolveFieldIds(current: StructType, incoming: StructType): StructType = {
    val currentIds = leafAndStructIds(current)
    var nextId = (0 +: currentIds.values.toSeq).max + 1
    def assign(st: StructType, prefix: String): StructType =
      StructType(st.fields.map { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val id = currentIds.getOrElse(path, { val i = nextId; nextId += 1; i })
        val withId = f.copy(metadata = new MetadataBuilder()
          .withMetadata(f.metadata).putLong(FieldIdKey, id.toLong).build())
        withId.dataType match {
          case s: StructType => withId.copy(dataType = assign(s, path))
          case _ => withId
        }
      })
    assign(incoming, "")
  }

  private def leafAndStructIds(st: StructType, prefix: String = "")
      : Map[String, Int] =
    st.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val own = if (f.metadata.contains(FieldIdKey))
        Seq(path -> f.metadata.getLong(FieldIdKey).toInt) else Nil
      own ++ (f.dataType match {
        case s: StructType => leafAndStructIds(s, path)
        case _ => Nil
      })
    }.toMap

  /** Assign sequential field ids (BFS order, like Iceberg's fresh-schema
    * assignment) to any fields that lack one.
    */
  def assignFieldIds(schema: StructType): StructType = {
    var nextId = {
      val existing = collectIds(schema)
      if (existing.isEmpty) 1 else existing.max + 1
    }
    def assign(st: StructType): StructType = StructType(st.fields.map { f =>
      val withId = if (f.metadata.contains(FieldIdKey)) f else {
        val id = nextId; nextId += 1
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(FieldIdKey, id.toLong).build())
      }
      withId.dataType match {
        case s: StructType => withId.copy(dataType = assign(s))
        case _ => withId
      }
    })
    assign(schema)
  }

  private def collectIds(st: StructType): Seq[Int] =
    st.fields.toSeq.flatMap { f =>
      val own = if (f.metadata.contains(FieldIdKey))
        Seq(f.metadata.getLong(FieldIdKey).toInt) else Nil
      own ++ (f.dataType match {
        case s: StructType => collectIds(s)
        case _ => Nil
      })
    }

  def fieldId(f: StructField): Int =
    if (f.metadata.contains(FieldIdKey)) f.metadata.getLong(FieldIdKey).toInt
    else -1

  /** Leaf (id, name-path, type) triples for stats bounds. */
  def leafFields(schema: StructType, prefix: String = "")
      : Seq[(Int, String, DataType)] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => leafFields(s, name)
        case dt => Seq((fieldId(f), name, dt))
      }
    }

  private def typeString(dt: DataType): String = dt match {
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case _ => throw new IllegalArgumentException(s"unsupported type $dt")
  }

  private def typeNode(dt: DataType, nf: JsonNodeFactory): JsonNode = dt match {
    case st: StructType => structNode(st, nf)
    case a: ArrayType =>
      val o = nf.objectNode()
      o.put("type", "list")
      o.put("element-id", 0)
      o.set[JsonNode]("element", typeNode(a.elementType, nf))
      o.put("element-required", !a.containsNull)
      o
    case m: MapType =>
      val o = nf.objectNode()
      o.put("type", "map"); o.put("key-id", 0); o.put("value-id", 0)
      o.set[JsonNode]("key", typeNode(m.keyType, nf))
      o.set[JsonNode]("value", typeNode(m.valueType, nf))
      o.put("value-required", !m.valueContainsNull)
      o
    case other => nf.textNode(typeString(other))
  }

  private def structNode(st: StructType, nf: JsonNodeFactory): ObjectNode = {
    val o = nf.objectNode()
    o.put("type", "struct")
    val fields = o.putArray("fields")
    st.fields.foreach { f =>
      val fo = fields.addObject()
      fo.put("id", fieldId(f))
      fo.put("name", f.name)
      fo.put("required", !f.nullable)
      fo.set[JsonNode]("type", typeNode(f.dataType, nf))
    }
    o
  }

  /** Iceberg schema JSON for a StructType (ids must be pre-assigned). */
  def toIcebergJson(schema: StructType, schemaId: Int = 0): String = {
    val nf = JsonNodeFactory.instance
    val o = structNode(schema, nf)
    o.put("schema-id", schemaId)
    Jsons.mapper.writeValueAsString(o)
  }

  private def parseType(n: JsonNode): DataType =
    if (n.isTextual) n.asText match {
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "boolean" => BooleanType
      case "string" => StringType
      case "binary" => BinaryType
      case "date" => DateType
      case "timestamptz" => TimestampType
      case "timestamp" => TimestampNTZType
      case s if s.startsWith("decimal") =>
        val m = "decimal\\((\\d+),\\s*(\\d+)\\)".r.findFirstMatchIn(s).get
        DecimalType(m.group(1).toInt, m.group(2).toInt)
      case other => throw new IllegalArgumentException(s"type $other")
    } else n.get("type").asText match {
      case "struct" => parseStruct(n)
      case "list" => ArrayType(parseType(n.get("element")),
        !n.get("element-required").asBoolean(true))
      case "map" => MapType(parseType(n.get("key")), parseType(n.get("value")),
        !n.get("value-required").asBoolean(true))
    }

  private def parseStruct(n: JsonNode): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(n.get("fields").elements().asScala.map { f =>
      StructField(
        f.get("name").asText,
        parseType(f.get("type")),
        nullable = !f.get("required").asBoolean(false),
        metadata = new MetadataBuilder()
          .putLong(FieldIdKey, f.get("id").asLong).build())
    }.toSeq)
  }

  def fromIcebergJson(json: String): StructType =
    parseStruct(Jsons.mapper.readTree(json))
}
