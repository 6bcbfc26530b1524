package graft.formats.delta

import org.apache.spark.sql.types.{StructField, StructType}

/** Delta column mapping (PROTOCOL.md §column-mapping; reference
  * DeltaSchemaExtractor.java:137-144): with
  * `delta.columnMapping.mode = name|id`, each schema field's metadata
  * carries `delta.columnMapping.physicalName` (and `.id`), parquet files
  * store columns under the PHYSICAL names, and add-action partition values
  * and stats are keyed by physical name. A reader that ignores the mapping
  * silently reads nulls for every renamed column.
  *
  * Scope: top-level fields (same granularity as the flat stats plane).
  */
object DeltaColumnMapping {
  val ModeKey = "delta.columnMapping.mode"
  val PhysicalNameKey = "delta.columnMapping.physicalName"
  val IdKey = "delta.columnMapping.id"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey))
      f.metadata.getString(PhysicalNameKey)
    else f.name

  def isMapped(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** The schema as the parquet files spell it. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f))))

  /** physical → logical name for every mapped field. */
  def physicalToLogical(schema: StructType): Map[String, String] =
    schema.fields.toSeq.flatMap { f =>
      val p = physicalName(f)
      if (p != f.name) Some(p -> f.name) else None
    }.toMap
}
