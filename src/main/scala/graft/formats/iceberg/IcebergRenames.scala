package graft.formats.iceberg

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._

import graft.util.Jsons

/** Iceberg RENAME COLUMN lineage (spec §Schema Evolution: a rename keeps
  * the field id; data files keep whatever name they were written with).
  *
  * Graft's scan resolves parquet columns BY NAME (adopted files carry no
  * embedded field ids), so a renamed column splits the file population:
  * pre-rename files spell it under the old name, post-rename files under
  * the new one. [[annotate]] reconstructs that lineage from the
  * metadata's historical schemas (matched by field id) and stamps each
  * renamed top-level field with `graft.renamedFrom` — the scan
  * (DeltaRead.toDataFrameImpl) then reads the old names as SHADOW
  * columns and `coalesce`s per file, which is exact: a parquet file
  * carries exactly one of the names, the other reads as null, and
  * explicit stored nulls stay null because the stored name's column
  * serves them as stored.
  *
  * Shapes a name-resolved scan CANNOT serve refuse loudly instead of
  * nulling silently (the wrong-answer class):
  *  - NESTED renames: parquet resolves nested fields by name inside the
  *    column; no per-file shadow is expressible in one scan schema.
  *  - Swap-style renames: an old name that is now ANOTHER live column's
  *    name would pull that column's values into pre-rename files.
  *  - Rename of a field carrying an initial-default: the existence fill
  *    lands on the CURRENT name, so a pre-rename file (which has the old
  *    name, not the current one) would read the default instead of its
  *    stored values — per-row coalesce cannot undo that.
  *
  * Reference anchor: IcebergSchemaSync.java:82-118 emits the same
  * fieldId-keyed renames on the write side; real Iceberg readers resolve
  * by field id / name mapping, which graft's `schema.name-mapping.default`
  * property gives THEM — this object is the equivalent for graft's own
  * name-resolved scan.
  */
object IcebergRenames {

  /** StructField metadata key: JSON array of the field's historical
    * (pre-rename) names, oldest first.
    */
  val RenamedFromKey = "graft.renamedFrom"

  /** (top-level id→name, nested id→name) of an Iceberg schema JSON. */
  private def namesById(schemaNode: JsonNode)
      : (Map[Int, String], Map[Int, String]) = {
    import scala.jdk.CollectionConverters._
    val top = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    val nested = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    def walkStruct(node: JsonNode, isTop: Boolean): Unit =
      Option(node.get("fields")).foreach(_.elements().asScala.foreach { f =>
        (if (isTop) top else nested)(f.get("id").asInt) =
          f.get("name").asText
        walkType(f.get("type"))
      })
    def walkType(t: JsonNode): Unit =
      if (t != null && t.isObject) t.get("type").asText match {
        case "struct" => walkStruct(t, isTop = false)
        case "list" => walkType(t.get("element"))
        case "map" => walkType(t.get("key")); walkType(t.get("value"))
        case _ => ()
      }
    walkStruct(schemaNode, isTop = true)
    (top.toMap, nested.toMap)
  }

  /** Annotate `schema` (parsed from `curSchemaNode`) with rename lineage
    * against the table's historical schemas; throws on the unservable
    * shapes documented above.
    */
  def annotate(schema: StructType, curSchemaNode: JsonNode,
      otherSchemas: Seq[String], tablePath: String): StructType = {
    if (otherSchemas.isEmpty) return schema
    val (curTop, curNested) = namesById(curSchemaNode)
    val curNameSet = curTop.values.toSet
    val shadows = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.LinkedHashSet[String]]
    otherSchemas.foreach { s =>
      val (histTop, histNested) = namesById(Jsons.mapper.readTree(s))
      histNested.foreach { case (id, name) =>
        curNested.get(id).filter(_ != name).foreach { cur =>
          throw new UnsupportedOperationException(
            s"Iceberg table at $tablePath renamed NESTED field id $id " +
              s"('$name' -> '$cur'); parquet resolves nested fields by " +
              "name inside the column, so pre-rename files cannot be " +
              "served — refusing rather than null the field")
        }
      }
      histTop.foreach { case (id, name) =>
        curTop.get(id).foreach { cur =>
          // case-only renames resolve fine (Spark's parquet name
          // resolution is case-insensitive) — no shadow needed
          if (cur != name && !cur.equalsIgnoreCase(name))
            shadows.getOrElseUpdate(id,
              scala.collection.mutable.LinkedHashSet.empty) += name
        }
      }
    }
    if (shadows.isEmpty) return schema
    shadows.foreach { case (id, olds) =>
      olds.find(curNameSet.contains).foreach { o =>
        throw new UnsupportedOperationException(
          s"Iceberg table at $tablePath: field id $id was renamed from " +
            s"'$o', which is now the name of ANOTHER live column — a " +
            "name-resolved scan would serve that column's values for " +
            "pre-rename files; refusing rather than swap values")
      }
    }
    StructType(schema.fields.map { f =>
      shadows.get(IcebergSchemas.fieldId(f)) match {
        case None => f
        case Some(olds) =>
          if (f.metadata.contains("EXISTS_DEFAULT"))
            throw new UnsupportedOperationException(
              s"Iceberg table at $tablePath: field '${f.name}' is both " +
                "RENAMED and carries an initial-default — the existence " +
                "fill would mask stored values on pre-rename files; " +
                "refusing rather than serve wrong values")
          val arr = Jsons.mapper.createArrayNode()
          olds.foreach(arr.add)
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(RenamedFromKey,
              Jsons.mapper.writeValueAsString(arr)).build())
      }
    })
  }

  /** The field's historical names, oldest first; empty if never renamed. */
  def renamedFrom(f: StructField): Seq[String] = {
    import scala.jdk.CollectionConverters._
    if (!f.metadata.contains(RenamedFromKey)) Nil
    else Jsons.mapper.readTree(f.metadata.getString(RenamedFromKey))
      .elements().asScala.map(_.asText).toSeq
  }
}
