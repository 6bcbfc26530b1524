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
  /** Ids for collection positions (list element, map key/value) that have no
    * StructField of their own: stored on the enclosing field's metadata as a
    * JSON object of relative pseudo-path → id (e.g. {"element":7} for a
    * list, {"key":8,"value":9} for a map, {"value.element":10} for
    * map<_, list<_>>). The Iceberg spec requires these ids to be unique
    * across the whole schema, same as struct field ids.
    */
  val CollectionIdsKey = "graft.collectionIds"

  private def pjoin(prefix: String, name: String): String =
    if (prefix.isEmpty) name else s"$prefix.$name"

  /** All assigned ids in a schema, keyed by dotted path; collection
    * positions appear under pseudo segments `element`/`key`/`value`.
    */
  private def knownIds(st: StructType, prefix: String = ""): Map[String, Int] =
    st.fields.toSeq.flatMap { f =>
      val path = pjoin(prefix, f.name)
      val own = if (f.metadata.contains(FieldIdKey))
        Seq(path -> f.metadata.getLong(FieldIdKey).toInt) else Nil
      val coll = if (f.metadata.contains(CollectionIdsKey)) {
        import scala.jdk.CollectionConverters._
        Jsons.mapper.readTree(f.metadata.getString(CollectionIdsKey))
          .properties().asScala.map(e => s"$path.${e.getKey}" -> e.getValue.asInt)
          .toSeq
      } else Nil
      def nested(dt: DataType, p: String): Seq[(String, Int)] = dt match {
        case s: StructType => knownIds(s, p).toSeq
        case a: ArrayType => nested(a.elementType, s"$p.element")
        case m: MapType =>
          nested(m.keyType, s"$p.key") ++ nested(m.valueType, s"$p.value")
        case _ => Nil
      }
      own ++ coll ++ nested(f.dataType, path)
    }.toMap

  /** One assignment pass: every struct field AND every collection position
    * gets an id — from `existing` by path when present, fresh otherwise.
    * `floor`: fresh ids start past this as well, so ids of dropped fields
    * are never reused (Iceberg spec: ids are never recycled).
    */
  private def assignIds(schema: StructType, existing: Map[String, Int],
      floor: Int = 0): StructType = {
    var nextId = math.max(floor, (0 +: existing.values.toSeq).max) + 1
    def idFor(path: String): Int =
      existing.getOrElse(path, { val i = nextId; nextId += 1; i })
    def walkStruct(st: StructType, prefix: String): StructType =
      StructType(st.fields.map { f =>
        val path = pjoin(prefix, f.name)
        val id = idFor(path)
        val collIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
        def walkType(dt: DataType, tPath: String, rel: String): DataType = dt match {
          case s: StructType => walkStruct(s, tPath)
          case a: ArrayType =>
            val rp = if (rel.isEmpty) "element" else s"$rel.element"
            collIds(rp) = idFor(s"$tPath.element")
            a.copy(elementType = walkType(a.elementType, s"$tPath.element", rp))
          case m: MapType =>
            val rk = if (rel.isEmpty) "key" else s"$rel.key"
            val rv = if (rel.isEmpty) "value" else s"$rel.value"
            collIds(rk) = idFor(s"$tPath.key")
            collIds(rv) = idFor(s"$tPath.value")
            m.copy(
              keyType = walkType(m.keyType, s"$tPath.key", rk),
              valueType = walkType(m.valueType, s"$tPath.value", rv))
          case other => other
        }
        val newType = walkType(f.dataType, path, "")
        val mb = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(FieldIdKey, id.toLong)
        if (collIds.nonEmpty) {
          val o = JsonNodeFactory.instance.objectNode()
          collIds.foreach { case (k, v) => o.put(k, v) }
          mb.putString(CollectionIdsKey, Jsons.mapper.writeValueAsString(o))
        }
        f.copy(dataType = newType, metadata = mb.build())
      })
    walkStruct(schema, "")
  }

  /** One schema-evolution operation, fieldId-keyed like the reference's
    * IcebergSchemaSync (IcebergSchemaSync.java:50-197). `op` is one of
    * promote | rename | drop | add; ops are emitted in that order
    * (Iceberg's UpdateSchema apply order: updates, renames, deletes, adds).
    */
  case class SchemaOp(op: String, fieldId: Int, path: String, detail: String)

  /** Type promotions the Iceberg spec allows (spec §Schema Evolution). */
  private def promotable(from: DataType, to: DataType): Boolean = (from, to) match {
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      a.scale == b.scale && b.precision >= a.precision
    case _ => false
  }

  /** Evolve `incoming` against `current`, computing the ordered op list.
    *
    * Matching is by field id when the incoming field carries one (a source
    * that tracks ids can express a rename: same id, new name), by dotted
    * name otherwise. Matched fields keep their ids; allowed type changes
    * (int→long, float→double, decimal widening) emit `promote`; any other
    * type change throws — silently re-typing a column would corrupt stats
    * and pruning on historical files. Unmatched current fields are dropped
    * (their ids are retired, never reused); unmatched incoming fields are
    * adds with fresh ids past the all-time maximum.
    */
  def evolveWithOps(current: StructType, incoming: StructType)
      : (StructType, Seq[SchemaOp]) = {
    val resolved = scala.collection.mutable.Map.empty[String, Int]
    val promotes = scala.collection.mutable.Buffer.empty[SchemaOp]
    val renames = scala.collection.mutable.Buffer.empty[SchemaOp]
    val drops = scala.collection.mutable.Buffer.empty[SchemaOp]
    val adds = scala.collection.mutable.Buffer.empty[SchemaOp]

    def idOf(f: StructField): Option[Int] =
      if (f.metadata.contains(FieldIdKey))
        Some(f.metadata.getLong(FieldIdKey).toInt) else None

    def matchType(cur: DataType, inc: DataType, path: String, cid: Int): Unit =
      (cur, inc) match {
        case (a: StructType, b: StructType) => matchStruct(Some(a), b, path)
        case (a: ArrayType, b: ArrayType) =>
          matchType(a.elementType, b.elementType, s"$path.element", cid)
        case (a: MapType, b: MapType) =>
          matchType(a.keyType, b.keyType, s"$path.key", cid)
          matchType(a.valueType, b.valueType, s"$path.value", cid)
        case (a, b) if a == b => ()
        case (a, b) if promotable(a, b) =>
          promotes += SchemaOp("promote", cid, path,
            s"${a.simpleString} -> ${b.simpleString}")
        case (a, b) => throw new IllegalArgumentException(
          s"incompatible type change at $path: " +
            s"${a.simpleString} -> ${b.simpleString}")
      }

    def matchStruct(cur: Option[StructType], inc: StructType, prefix: String)
        : Unit = {
      val curById = cur.toSeq.flatMap(_.fields)
        .flatMap(f => idOf(f).map(_ -> f)).toMap
      val curByName = cur.toSeq.flatMap(_.fields).map(f => f.name -> f).toMap
      val matched = scala.collection.mutable.Set.empty[String]
      inc.fields.foreach { f =>
        val inPath = pjoin(prefix, f.name)
        val curMatch = idOf(f).flatMap(curById.get).orElse(curByName.get(f.name))
        curMatch.flatMap(cf => idOf(cf).map(cf -> _)) match {
          case Some((cf, cid)) =>
            matched += cf.name
            resolved(inPath) = cid
            if (cf.name != f.name)
              renames += SchemaOp("rename", cid, pjoin(prefix, cf.name), f.name)
            collectionIdsOf(cf).foreach { case (rel, id) =>
              resolved(s"$inPath.$rel") = id
            }
            matchType(cf.dataType, f.dataType, inPath, cid)
          case None =>
            adds += SchemaOp("add", -1, inPath, f.dataType.simpleString)
            f.dataType match {
              case s: StructType => matchStruct(None, s, inPath)
              case _ => ()
            }
        }
      }
      cur.foreach(_.fields.foreach { cf =>
        if (!matched.contains(cf.name))
          drops += SchemaOp("drop", idOf(cf).getOrElse(-1),
            pjoin(prefix, cf.name), cf.dataType.simpleString)
      })
    }

    matchStruct(Some(current), incoming, "")
    val allCurrent = knownIds(current)
    val floor = (0 +: allCurrent.values.toSeq).max
    val evolved = assignIds(incoming, resolved.toMap, floor)
    (evolved, (promotes ++ renames ++ drops ++ adds).toSeq)
  }

  /** Evolve `incoming` against `current`: fields that exist in the current
    * schema (by id or dotted name) keep their ids; only genuinely new
    * fields get fresh ids past the all-time maximum. Without this, an
    * id-less source adding a middle column would shift every later id and
    * corrupt stats/pruning on historical files.
    */
  def evolveFieldIds(current: StructType, incoming: StructType): StructType =
    evolveWithOps(current, incoming)._1

  /** Assign sequential field ids (pre-order, like Iceberg's fresh-schema
    * assignment) to any fields or collection positions that lack one.
    */
  def assignFieldIds(schema: StructType): StructType =
    assignIds(schema, knownIds(schema))

  /** Every assigned id in the schema, keyed by dotted path (collection
    * positions under `element`/`key`/`value` pseudo-segments) — the
    * registry other formats persist (Hudi id tracking).
    */
  def allFieldIds(schema: StructType): Map[String, Int] = knownIds(schema)

  /** Apply a persisted path→id registry onto a schema (overriding any ids
    * it carries); unmapped paths get fresh ids past `floor`, so ids of
    * dropped fields are never recycled.
    */
  def withFieldIds(schema: StructType, existing: Map[String, Int],
      floor: Int): StructType = assignIds(schema, existing, floor)

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

  /** `collIds`: the enclosing field's collection-position ids keyed by
    * relative pseudo-path; `rel` tracks the position within the field.
    * Missing ids fail loudly — a schema must pass through assignFieldIds /
    * evolveFieldIds before serialization (Iceberg spec: ids are required
    * and unique; 0-ids would mis-resolve nested collections in any reader).
    */
  private def typeNode(dt: DataType, nf: JsonNodeFactory,
      collIds: Map[String, Int], rel: String): JsonNode = dt match {
    case st: StructType => structNode(st, nf)
    case a: ArrayType =>
      val rp = if (rel.isEmpty) "element" else s"$rel.element"
      val o = nf.objectNode()
      o.put("type", "list")
      o.put("element-id", collIds.getOrElse(rp, throw new IllegalStateException(
        s"no element-id assigned at $rp; run assignFieldIds first")))
      o.set[JsonNode]("element", typeNode(a.elementType, nf, collIds, rp))
      o.put("element-required", !a.containsNull)
      o
    case m: MapType =>
      val rk = if (rel.isEmpty) "key" else s"$rel.key"
      val rv = if (rel.isEmpty) "value" else s"$rel.value"
      val o = nf.objectNode()
      o.put("type", "map")
      o.put("key-id", collIds.getOrElse(rk, throw new IllegalStateException(
        s"no key-id assigned at $rk; run assignFieldIds first")))
      o.put("value-id", collIds.getOrElse(rv, throw new IllegalStateException(
        s"no value-id assigned at $rv; run assignFieldIds first")))
      o.set[JsonNode]("key", typeNode(m.keyType, nf, collIds, rk))
      o.set[JsonNode]("value", typeNode(m.valueType, nf, collIds, rv))
      o.put("value-required", !m.valueContainsNull)
      o
    case other => nf.textNode(typeString(other))
  }

  private def collectionIdsOf(f: StructField): Map[String, Int] =
    if (!f.metadata.contains(CollectionIdsKey)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Jsons.mapper.readTree(f.metadata.getString(CollectionIdsKey))
        .properties().asScala.map(e => e.getKey -> e.getValue.asInt).toMap
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
      // Avro-origin logical types keep their native Iceberg spelling
      // (uuid, fixed[N]) — dropping them to string/binary would be lossy
      // for round-trips through an Iceberg reader
      import graft.model.AvroSchemas
      val tn: JsonNode = f.dataType match {
        case StringType if f.metadata.contains(AvroSchemas.UuidKey) =>
          nf.textNode("uuid")
        case BinaryType if f.metadata.contains(AvroSchemas.FixedSizeKey) =>
          nf.textNode(s"fixed[${f.metadata.getLong(AvroSchemas.FixedSizeKey)}]")
        case dt => typeNode(dt, nf, collectionIdsOf(f), "")
      }
      fo.set[JsonNode]("type", tn)
      // v3 default values round-trip through the EXISTS_DEFAULT
      // metadata the reader attaches (IcebergMetadata.read) and ALTER
      // ADD COLUMN ... DEFAULT plants — emitted as the spec's JSON
      // single-value under initial-default AND write-default
      if (f.metadata.contains("EXISTS_DEFAULT"))
        defaultValueNode(f, nf).foreach { dn =>
          fo.set[JsonNode]("initial-default", dn)
          fo.set[JsonNode]("write-default", dn)
        }
    }
    o
  }

  /** Types whose DEFAULT values round-trip through both sides of this
    * engine: serialized as the spec's JSON single-value
    * ([[defaultValueNode]]) AND servable at read via Spark's
    * existence-default scan fill (IcebergValues.fromJsonSingle — binary
    * is excluded there because the vectorized reader cannot fill binary
    * constants). ALTER ADD COLUMN ... DEFAULT refuses anything outside
    * this set at DDL time, so a successfully-committed default is never
    * silently dropped from the schema JSON.
    */
  def defaultRepresentable(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
        StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case st: StructType => st.fields.forall(f =>
      defaultRepresentable(f.dataType))
    case a: ArrayType => defaultRepresentable(a.elementType)
    case m: MapType =>
      defaultRepresentable(m.keyType) && defaultRepresentable(m.valueType)
    case _ => false
  }

  /** The spec's JSON single-value (spec Appendix D) for a field's
    * EXISTS_DEFAULT literal, re-evaluated through catalyst. FAILS LOUDLY
    * on any shape it cannot serialize — silently omitting the default
    * from the committed schema would make every later read serve NULL
    * for a default the DDL accepted (the r14 ADVICE wrong-answer).
    */
  private def defaultValueNode(f: StructField,
      nf: JsonNodeFactory): Option[JsonNode] = {
    // Spark's own default-column analyzer: resolves function-form
    // literals (NAMED_STRUCT/ARRAY/MAP render unresolved from a bare
    // parse) and constant-folds, exactly as the scan side will
    val v = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .analyze(f, "graft schema serialization", "EXISTS_DEFAULT").eval()
    if (v == null)
      throw new IllegalArgumentException(
        s"EXISTS_DEFAULT on '${f.name}' evaluates to null — a null " +
          "default is omission, not a value")
    Some(singleValueNode(f.dataType, v, nf, f.name))
  }

  /** Catalyst INTERNAL value → spec JSON single-value. Struct values are
    * keyed by FIELD ID (nested ids come from the assigned schema's
    * metadata — serialization always runs post-assignment).
    */
  private def singleValueNode(dt: DataType, v: Any, nf: JsonNodeFactory,
      at: String): JsonNode = (dt, v) match {
    case (BooleanType, b: java.lang.Boolean) => nf.booleanNode(b)
    case (IntegerType, i: java.lang.Integer) => nf.numberNode(i)
    case (LongType, l: java.lang.Long) => nf.numberNode(l)
    case (FloatType, x: java.lang.Float) => nf.numberNode(x)
    case (DoubleType, x: java.lang.Double) => nf.numberNode(x)
    case (StringType, s) => nf.textNode(s.toString)
    case (DateType, d: java.lang.Integer) =>
      nf.textNode(java.time.LocalDate.ofEpochDay(d.longValue).toString)
    case (TimestampType, micros: java.lang.Long) =>
      // spec: timestamptz single-values carry an explicit +00:00 offset
      nf.textNode(java.time.OffsetDateTime.ofInstant(
        microsInstant(micros), java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSSSSSxxx")))
    case (TimestampNTZType, micros: java.lang.Long) =>
      nf.textNode(java.time.LocalDateTime.ofInstant(
        microsInstant(micros), java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSSSSS")))
    case (_: DecimalType, d: org.apache.spark.sql.types.Decimal) =>
      // spec: decimals serialize as a JSON string with the exact scale
      nf.textNode(d.toJavaBigDecimal.toPlainString)
    case (st: StructType, row: org.apache.spark.sql.catalyst.InternalRow) =>
      val o = nf.objectNode()
      st.fields.zipWithIndex.foreach { case (sf, i) =>
        if (!row.isNullAt(i)) {
          val id = fieldId(sf)
          require(id >= 0, s"struct default at '$at.${sf.name}' has no " +
            "assigned field id — serialize after assignFieldIds")
          o.set[JsonNode](id.toString,
            singleValueNode(sf.dataType, row.get(i, sf.dataType), nf,
              s"$at.${sf.name}"))
        }
      }
      o
    case (a: ArrayType,
        arr: org.apache.spark.sql.catalyst.util.ArrayData) =>
      val out = nf.arrayNode()
      arr.toObjectArray(a.elementType).foreach(e =>
        out.add(if (e == null) nf.nullNode()
          else singleValueNode(a.elementType, e, nf, s"$at.element")))
      out
    case (m: MapType, md: org.apache.spark.sql.catalyst.util.MapData) =>
      val o = nf.objectNode()
      val ks = o.putArray("keys"); val vs = o.putArray("values")
      md.keyArray().toObjectArray(m.keyType).foreach(k =>
        ks.add(singleValueNode(m.keyType, k, nf, s"$at.key")))
      md.valueArray().toObjectArray(m.valueType).foreach(x =>
        vs.add(if (x == null) nf.nullNode()
          else singleValueNode(m.valueType, x, nf, s"$at.value")))
      o
    case (other, value) => throw new IllegalArgumentException(
      s"cannot serialize default $value at '$at' as Iceberg " +
        s"single-value for type ${other.simpleString}")
  }

  private def microsInstant(micros: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)

  /** Iceberg schema JSON for a StructType (ids must be pre-assigned). */
  def toIcebergJson(schema: StructType, schemaId: Int = 0): String = {
    val nf = JsonNodeFactory.instance
    val o = structNode(schema, nf)
    o.put("schema-id", schemaId)
    Jsons.mapper.writeValueAsString(o)
  }

  /** `schema.name-mapping.default` JSON (Iceberg spec §Name Mapping
    * Serialization; reference writes it on create,
    * IcebergConversionTarget.java:158-210): a field-id→names tree that
    * lets engines resolve columns in parquet files WITHOUT embedded field
    * ids — exactly what graft-synced tables are, since the data files were
    * written by plain Spark. Ids must be pre-assigned (assignFieldIds).
    */
  def nameMappingJson(schema: StructType): String = {
    val nf = JsonNodeFactory.instance

    def mapType(dt: DataType, collIds: Map[String, Int], rel: String,
        into: com.fasterxml.jackson.databind.node.ArrayNode): Unit = dt match {
      case st: StructType => st.fields.foreach { f =>
        val fo = into.addObject()
        fo.put("field-id", fieldId(f))
        fo.putArray("names").add(f.name)
        val nested = nf.arrayNode()
        f.dataType match {
          case s: StructType => mapType(s, Map.empty, "", nested)
          case other => mapType(other, collectionIdsOf(f), "", nested)
        }
        if (nested.size() > 0) fo.set[JsonNode]("fields", nested)
      }
      case a: ArrayType =>
        val rp = if (rel.isEmpty) "element" else s"$rel.element"
        val fo = into.addObject()
        fo.put("field-id", collIds(rp))
        fo.putArray("names").add("element")
        val nested = nf.arrayNode()
        mapType(a.elementType, collIds, rp, nested)
        if (nested.size() > 0) fo.set[JsonNode]("fields", nested)
      case m: MapType =>
        val rk = if (rel.isEmpty) "key" else s"$rel.key"
        val rv = if (rel.isEmpty) "value" else s"$rel.value"
        val ko = into.addObject()
        ko.put("field-id", collIds(rk))
        ko.putArray("names").add("key")
        val kn = nf.arrayNode()
        mapType(m.keyType, collIds, rk, kn)
        if (kn.size() > 0) ko.set[JsonNode]("fields", kn)
        val vo = into.addObject()
        vo.put("field-id", collIds(rv))
        vo.putArray("names").add("value")
        val vn = nf.arrayNode()
        mapType(m.valueType, collIds, rv, vn)
        if (vn.size() > 0) vo.set[JsonNode]("fields", vn)
      case _ => ()
    }

    val root = nf.arrayNode()
    mapType(schema, Map.empty, "", root)
    Jsons.mapper.writeValueAsString(root)
  }

  /** Parse a type node, collecting collection-position ids into `collIds`
    * (relative pseudo-paths from the enclosing struct field) so the
    * element/key/value ids round-trip through StructField metadata.
    */
  private def parseType(n: JsonNode, rel: String,
      collIds: scala.collection.mutable.Map[String, Int]): DataType =
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
      case "uuid" => StringType
      case s if s.startsWith("fixed") => BinaryType
      case s if s.startsWith("decimal") =>
        val m = "decimal\\((\\d+),\\s*(\\d+)\\)".r.findFirstMatchIn(s).get
        DecimalType(m.group(1).toInt, m.group(2).toInt)
      // v3 additions this engine cannot map — refuse NAMING the type and
      // the spec version that introduced it, never a generic error
      case t @ ("timestamp_ns" | "timestamptz_ns") =>
        throw new UnsupportedOperationException(
          s"Iceberg type '$t' (spec v3) has no lossless Spark mapping — " +
            "Spark timestamps are microsecond-precision, and truncating " +
            "nanoseconds would silently alter stored values; refusing")
      case t @ ("variant" | "geometry" | "geography" | "unknown") =>
        throw new UnsupportedOperationException(
          s"Iceberg type '$t' (spec v3) is not supported by this " +
            "engine — refusing rather than misread the column")
      case "time" =>
        throw new UnsupportedOperationException(
          "Iceberg type 'time' (spec v1) has no Spark column type — " +
            "refusing rather than misread the column")
      case other => throw new IllegalArgumentException(s"type $other")
    } else n.get("type").asText match {
      case "struct" => parseStruct(n)
      case "list" =>
        val rp = if (rel.isEmpty) "element" else s"$rel.element"
        Option(n.get("element-id")).foreach(id => collIds(rp) = id.asInt)
        ArrayType(parseType(n.get("element"), rp, collIds),
          !n.get("element-required").asBoolean(true))
      case "map" =>
        val rk = if (rel.isEmpty) "key" else s"$rel.key"
        val rv = if (rel.isEmpty) "value" else s"$rel.value"
        Option(n.get("key-id")).foreach(id => collIds(rk) = id.asInt)
        Option(n.get("value-id")).foreach(id => collIds(rv) = id.asInt)
        MapType(parseType(n.get("key"), rk, collIds),
          parseType(n.get("value"), rv, collIds),
          !n.get("value-required").asBoolean(true))
    }

  private def parseStruct(n: JsonNode): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(n.get("fields").elements().asScala.map { f =>
      val collIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      val dt = parseType(f.get("type"), "", collIds)
      val mb = new MetadataBuilder().putLong(FieldIdKey, f.get("id").asLong)
      if (f.get("type").isTextual) f.get("type").asText match {
        case "uuid" =>
          mb.putString(graft.model.AvroSchemas.UuidKey, "uuid")
        case s if s.startsWith("fixed[") =>
          mb.putLong(graft.model.AvroSchemas.FixedSizeKey,
            s.stripPrefix("fixed[").stripSuffix("]").toLong)
        case _ =>
      }
      if (collIds.nonEmpty) {
        val o = JsonNodeFactory.instance.objectNode()
        collIds.foreach { case (k, v) => o.put(k, v) }
        mb.putString(CollectionIdsKey, Jsons.mapper.writeValueAsString(o))
      }
      StructField(
        f.get("name").asText, dt,
        nullable = !f.get("required").asBoolean(false),
        metadata = mb.build())
    }.toSeq)
  }

  def fromIcebergJson(json: String): StructType =
    parseStruct(Jsons.mapper.readTree(json))
}
