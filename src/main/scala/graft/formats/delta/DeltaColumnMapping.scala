package graft.formats.delta

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Delta column mapping (PROTOCOL.md §column-mapping; reference
  * DeltaSchemaExtractor.java:137-144): with
  * `delta.columnMapping.mode = name|id`, each schema field's metadata
  * carries `delta.columnMapping.physicalName` (and `.id`), parquet files
  * store columns under the PHYSICAL names, and add-action partition values
  * and stats are keyed by physical name. A reader that ignores the mapping
  * silently reads nulls for every renamed column.
  *
  * Mapping applies at EVERY nesting level (struct fields inside structs,
  * arrays, and maps each carry their own physicalName metadata); the
  * logical rename on read is a positional struct cast, so arbitrary
  * nesting renames in one expression. The flat stats plane keys min/max
  * by top-level leaf only — nested-field stats skipping is out of scope
  * (matches the reference, whose stats extraction is also top-level).
  */
object DeltaColumnMapping {
  val ModeKey = "delta.columnMapping.mode"
  val PhysicalNameKey = "delta.columnMapping.physicalName"
  val IdKey = "delta.columnMapping.id"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey))
      f.metadata.getString(PhysicalNameKey)
    else f.name

  def isMapped(schema: StructType): Boolean = isMappedType(schema)

  private def isMappedType(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.exists(f => physicalName(f) != f.name || isMappedType(f.dataType))
    case a: ArrayType => isMappedType(a.elementType)
    case m: MapType => isMappedType(m.keyType) || isMappedType(m.valueType)
    case _ => false
  }

  /** `dt` with every nested struct field under its physical name. */
  def physicalType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))
    case a: ArrayType => a.copy(elementType = physicalType(a.elementType))
    case m: MapType =>
      m.copy(keyType = physicalType(m.keyType),
        valueType = physicalType(m.valueType))
    case other => other
  }

  /** The schema as the parquet files spell it (all nesting levels). */
  def physicalSchema(schema: StructType): StructType =
    physicalType(schema).asInstanceOf[StructType]

  /** physical → logical name for every mapped field. */
  def physicalToLogical(schema: StructType): Map[String, String] =
    schema.fields.toSeq.flatMap { f =>
      val p = physicalName(f)
      if (p != f.name) Some(p -> f.name) else None
    }.toMap

  /** `df` re-spelled the way a mapped table's files store it: every
    * column cast to its physical type (renaming all nesting levels in
    * one positional struct cast) and aliased to its top-level physical
    * name — the exact reverse of the read path's logical rename.
    * Columns not in `schema` (e.g. routing columns a partition spec
    * added) pass through untouched. No-op on unmapped schemas.
    */
  def renameToPhysical(df: org.apache.spark.sql.DataFrame,
      schema: StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    if (!isMapped(schema)) df
    else df.select(df.columns.toSeq.map { c =>
      schema.fields.find(_.name == c) match {
        case Some(f) =>
          col(c).cast(physicalType(f.dataType)).as(physicalName(f))
        case None => col(c)
      }
    }: _*)
  }
}
