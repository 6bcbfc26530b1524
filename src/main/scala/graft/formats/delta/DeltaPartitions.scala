package graft.formats.delta

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StringType, StructField, StructType}

import graft.model.{PartitionFieldSpec, Transform}

/** Delta has no native partition transforms — the reference emulates them
  * with generated columns whose `delta.generationExpression` encodes the
  * transform, and recovers the transform by regex-parsing that expression
  * back (DeltaPartitionExtractor.java:71-88,105-181,232-318,440-540).
  * Same grammar here:
  *
  *   YEAR   → `YEAR(src)`
  *   MONTH  → `DATE_FORMAT(src, 'yyyy-MM')`
  *   DAY    → `CAST(src AS DATE)` (or `DATE_FORMAT(src, fmt)` when a
  *            custom format is configured)
  *   HOUR   → `DATE_FORMAT(src, 'yyyy-MM-dd-HH')`
  *   BUCKET → `MOD((HASH(src) & 2147483647), n)`
  */
object DeltaPartitions {
  val GenerationExpressionKey = "delta.generationExpression"

  def generationExpression(spec: PartitionFieldSpec): Option[String] =
    spec.transform match {
      case Transform.Value => None
      case Transform.Year => Some(s"YEAR(${spec.sourceField})")
      case Transform.Month => Some(
        s"DATE_FORMAT(${spec.sourceField}, '${spec.format.getOrElse("yyyy-MM")}')")
      case Transform.Day => spec.format match {
        case Some(fmt) => Some(s"DATE_FORMAT(${spec.sourceField}, '$fmt')")
        case None => Some(s"CAST(${spec.sourceField} AS DATE)")
      }
      case Transform.Hour => Some(
        s"DATE_FORMAT(${spec.sourceField}, '${spec.format.getOrElse("yyyy-MM-dd-HH")}')")
      case Transform.Bucket => Some(
        s"MOD((HASH(${spec.sourceField}) & 2147483647), ${spec.numBuckets.getOrElse(16)})")
    }

  private val YearRe = "YEAR\\((\\w+)\\)".r
  private val CastDateRe = "CAST\\((\\w+) AS DATE\\)".r
  private val DateFormatRe = "DATE_FORMAT\\((\\w+), '([^']+)'\\)".r
  private val BucketRe = "MOD\\(\\(HASH\\((\\w+)\\) & \\d+\\), (\\d+)\\)".r

  /** Inverse of generationExpression — the reference's regex grammar. */
  def parseExpression(expr: String, targetColumn: String)
      : Option[PartitionFieldSpec] = expr.trim match {
    case YearRe(src) => Some(PartitionFieldSpec(src, Transform.Year))
    case CastDateRe(src) => Some(PartitionFieldSpec(src, Transform.Day))
    case DateFormatRe(src, fmt) =>
      // reference format constants (DeltaPartitionExtractor.java:74-77):
      // yyyy → YEAR, yyyy-MM → MONTH, yyyy-MM-dd → DAY, yyyy-MM-dd-HH → HOUR
      val t = fmt.count(_ == '-') match {
        case 0 => Transform.Year
        case 1 => Transform.Month
        case 2 => Transform.Day
        case _ => Transform.Hour
      }
      Some(PartitionFieldSpec(src, t, format = Some(fmt)))
    case BucketRe(src, n) =>
      Some(PartitionFieldSpec(src, Transform.Bucket, numBuckets = Some(n.toInt)))
    case _ => None
  }

  /** Add generated partition columns (string-typed, with generation
    * expressions in metadata) to a schema for the given transform specs.
    * VALUE transforms partition on the source column itself and add
    * nothing.
    */
  def withGeneratedColumns(schema: StructType,
      specs: Seq[PartitionFieldSpec]): StructType = {
    val extra = specs.flatMap { s =>
      generationExpression(s).map { expr =>
        StructField(s.partitionColumnName, StringType, nullable = true,
          metadata = new MetadataBuilder()
            .putString(GenerationExpressionKey, expr).build())
      }
    }.filterNot(f => schema.fieldNames.contains(f.name))
    StructType(schema.fields ++ extra)
  }

  /** Recover transform specs from a schema's generated columns. */
  def specsFromSchema(schema: StructType, partitionColumns: Seq[String])
      : Seq[PartitionFieldSpec] =
    partitionColumns.flatMap { c =>
      schema.fields.find(_.name == c) match {
        case Some(f) if f.metadata.contains(GenerationExpressionKey) =>
          parseExpression(f.metadata.getString(GenerationExpressionKey), c)
        case Some(_) => Some(PartitionFieldSpec(c, Transform.Value))
        case None => Some(PartitionFieldSpec(c, Transform.Value))
      }
    }
}
