package graft.sync

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.util.{HadoopConfs, Jsons}

/** User-facing schema evolution — `GRAFT ALTER TABLE`, routed by format.
  *
  * The matrix is serve-or-refuse, never silently wrong, and the refusals
  * are driven by how graft READS each format: the file scan resolves
  * parquet columns by NAME (adopted data files carry no Iceberg field
  * ids), so any change that breaks name resolution on already-written
  * files is refused unless the format's read path can remap it.
  *
  *  - ADD COLUMN (nullable, top-level): all four formats. Existing files
  *    lack the column and serve nulls — the parquet missing-column rule.
  *    Iceberg additionally refuses re-adding a name present in ANY
  *    historical schema (name-resolved reads would resurrect the old
  *    values for old files; Iceberg proper avoids this with field ids).
  *  - RENAME COLUMN: Delta WITH column mapping (physical names in the
  *    files never change; the read path's logical-rename pass —
  *    DeltaColumnMapping — keeps old files correct) and Iceberg (the
  *    rename is fieldId-keyed; the read path's shadow-coalesce —
  *    IcebergRenames — serves pre-rename files under the new name).
  *    Unmapped Delta, Hudi, Paimon refuse: their reads resolve by name
  *    and a rename would null the column on every pre-rename file.
  *  - DROP COLUMN: Delta with column mapping, and Iceberg (a dropped
  *    column is simply no longer projected; old files' extra column is
  *    ignored). Unmapped Delta refuses (delta-spark's own rule — a later
  *    re-add would resurrect old values); Hudi/Paimon refuse (their
  *    schema planes have no drop-tracking to guard the re-add).
  *
  * Mechanics: Delta lands a targeted metaData-only commit that carries
  * the table's EXISTING protocol forward (never the sync path's (1,2)
  * floor). The other formats ride their own conversion target with an
  * unchanged file set — an empty-diff commit whose schema is the evolved
  * one (Iceberg writes a fresh schema id via evolveWithOps; Paimon
  * writes schema-(N+1) and the snapshot references it; Hudi carries the
  * schema in commit extraMetadata).
  *
  * Reference anchor: the reference evolves target schemas only as a
  * side-effect of source evolution (SchemaEvolutionTest paths,
  * xtable-core/src/main/java/org/apache/xtable/schema/SchemaUtils.java);
  * this surface exposes the same evolution rules as user DDL.
  */
object AlterTable {

  sealed trait Op
  /** `defaultSql` (Iceberg v3 only): the column's DEFAULT literal — lands
    * as the spec's `initial-default`/`write-default` on the new field, so
    * pre-existing rows serve it (the read side maps it onto Spark's
    * existence-default scan fill).
    */
  case class AddColumn(name: String, typeDdl: String,
      defaultSql: Option[String] = None) extends Op
  case class RenameColumn(from: String, to: String) extends Op
  case class DropColumn(name: String) extends Op
  case class AlterColumnType(name: String, typeDdl: String) extends Op
  /** Iceberg partition-spec evolution (spec v2 §Partition Evolution):
    * `transformDdl` is the Iceberg DDL transform — `col`, `year(col)`,
    * `month(col)`, `day(col)`, `hour(col)`, or `bucket(N, col)`. The op
    * is metadata-only: existing files stay under the spec they were
    * written with; only future writes take the new layout.
    */
  case class AddPartitionField(transformDdl: String) extends Op
  case class DropPartitionField(name: String) extends Op
  /** Iceberg format-version upgrade (`SET TBLPROPERTIES
    * ('format-version'='3')`): metadata-only commit that assigns row
    * lineage to every existing entry (IcebergRowLineage.assignOnUpgrade)
    * and starts the next-row-id watermark.
    */
  case class SetFormatVersion(version: Int) extends Op
  /** Delta row tracking enablement (`SET TBLPROPERTIES
    * ('delta.enableRowTracking'='true')`): one commit that raises the
    * writer protocol, backfills every live file's baseRowId and seeds
    * the high-water mark (DeltaRowTracking.enable). Disabling is
    * refused — retracting assigned ids would corrupt downstream
    * consumers keyed on them.
    */
  case class EnableRowTracking(on: Boolean) extends Op

  case class Result(format: String, schema: StructType)

  def run(spark: SparkSession, tablePath: String, op: Op): Result = {
    val path = graft.util.PathUtils.canonical(tablePath)
    val source = graft.sources.CatalogConversionSource.fromPath(
      spark, path, path.stripSuffix("/").split('/').last)
    val fmt = source match {
      case _: graft.formats.delta.DeltaConversionSource => "delta"
      case _: graft.formats.iceberg.IcebergConversionSource => "iceberg"
      case _: graft.formats.hudi.HudiConversionSource => "hudi"
      case _: graft.formats.paimon.PaimonConversionSource => "paimon"
      case other => throw new IllegalArgumentException(
        s"ALTER TABLE needs a versioned metadata plane; this is a " +
          s"${other.sourceFormat} table")
    }
    op match {
      case EnableRowTracking(on) =>
        require(fmt == "delta",
          s"delta.enableRowTracking is a Delta capability; this is a " +
            s"$fmt table")
        require(on, "disabling row tracking is not supported — assigned " +
          "row ids are a durable contract; refusing rather than retract " +
          "them")
        graft.formats.delta.DeltaRowTracking.enable(spark, path)
        return Result(fmt, source.currentTable().schema)
      case SetFormatVersion(v) =>
        // handled BEFORE currentSnapshot(): the upgrade is legal on a
        // table with live equality deletes, which the file-level
        // snapshot refuses
        require(fmt == "iceberg",
          s"SET 'format-version' is an Iceberg capability; this is a " +
            s"$fmt table")
        require(v == 3,
          s"supported upgrade target is format-version 3, got $v")
        graft.formats.iceberg.IcebergDeletes.upgradeToV3(spark, path)
        return Result(fmt, source.currentTable().schema)
      case _ => ()
    }
    val snap = source.currentSnapshot()
    val cur = snap.table.schema
    val partCols = snap.table.partitionFields.map(_.partitionColumnName)

    op match {
      case p: AddPartitionField =>
        return runPartitionOp(spark, path, fmt, source, snap,
          add = Some(parsePartitionTransform(p.transformDdl, cur)),
          drop = None)
      case p: DropPartitionField =>
        return runPartitionOp(spark, path, fmt, source, snap,
          add = None, drop = Some(p.name))
      case _ => ()
    }
    val mapped = fmt == "delta" &&
      graft.formats.delta.DeltaColumnMapping.isMapped(cur)

    // config keys the evolved schema forces onto the Delta metaData
    // commit (column-mapping id watermark)
    var deltaConfigOverride: Map[String, String] = Map.empty
    var deltaTypeWidening = false

    val evolved: StructType = op match {
      case AddColumn(name, ddl, defaultSql) =>
        require(!name.contains('.'),
          s"nested column adds are not supported: $name")
        require(!cur.fieldNames.exists(_.equalsIgnoreCase(name)),
          s"column '$name' already exists")
        if (fmt == "iceberg")
          requireNeverNamedBefore(spark, path, name)
        val dt = DataType.fromDDL(ddl)
        // DEFAULT: v3 default values — canonicalized through a catalyst
        // literal and carried as EXISTS_DEFAULT metadata, which the
        // Iceberg schema writer emits as initial-default/write-default
        // and the reader maps back onto the scan's existence fill
        val defaultMeta = defaultSql.map { sql =>
          require(fmt == "iceberg",
            s"ADD COLUMN ... DEFAULT is an Iceberg v3 capability; " +
              s"this is a $fmt table")
          val v = graft.formats.iceberg.IcebergMetadata
            .currentVersion(path).get
          val fv = graft.formats.iceberg.IcebergMetadata.read(path, v)
            .formatVersion
          require(fv >= 3,
            s"ADD COLUMN ... DEFAULT needs format-version 3 (this table " +
              s"is v$fv) — GRAFT ALTER TABLE ... SET TBLPROPERTIES " +
              "('format-version'='3') first")
          // DDL-time representability gate (mirrors the read side's
          // servable set): a default the schema writer could not
          // serialize — or the scan could not fill — must refuse HERE,
          // not commit successfully and then serve NULL
          require(graft.formats.iceberg.IcebergSchemas
              .defaultRepresentable(dt),
            s"ADD COLUMN ... DEFAULT on type ${dt.simpleString}: this " +
              "engine serves defaults for boolean/int/long/float/double/" +
              "string/date/timestamp/timestamp_ntz/decimal and " +
              "struct/array/map thereof — binary and other types are " +
              "not servable (the vectorized scan cannot fill them)")
          import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
          // resolve + constant-fold through the session: function-form
          // literals (named_struct, array, map) parse UNRESOLVED, so a
          // bare foldable check on the parsed tree would reject them;
          // the optimizer folds any genuine literal to a Literal node,
          // and a non-constant (column reference, rand()) survives
          // folding and refuses below
          val folded = spark.sql(s"SELECT CAST(($sql) AS ${dt.sql})")
            .queryExecution.optimizedPlan.expressions.head match {
              case a: Alias => a.child
              case e => e
            }
          val lit = folded match {
            case l: Literal => l
            case other => throw new IllegalArgumentException(
              s"DEFAULT must be a constant literal: $sql (folds to " +
                s"${other.getClass.getSimpleName})")
          }
          require(lit.value != null, s"DEFAULT $sql does not cast to " +
            s"${dt.simpleString} — a null default is just omission")
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString("EXISTS_DEFAULT", Literal(lit.value, dt).sql).build()
        }
        val added0 =
          if (!mapped) StructField(name, dt, nullable = true)
          else {
            // a mapped table resolves fields by physicalName/id: an
            // unannotated field breaks delta-spark interop (it rejects
            // mapped schemas with unstamped fields), and a later GRAFT
            // RENAME would shift its implied physical name, nulling the
            // column on every pre-rename file. Fresh UUID physical name
            // (delta-spark's own scheme) can never collide with a
            // previously-dropped column's physical name; the id comes
            // from the maxColumnId watermark, which the commit bumps.
            val nextId = nextColumnId(spark, path, cur)
            deltaConfigOverride += (MaxColumnIdKey -> nextId.toString)
            StructField(name, dt, nullable = true,
              metadata = new org.apache.spark.sql.types.MetadataBuilder()
                .putString(
                  graft.formats.delta.DeltaColumnMapping.PhysicalNameKey,
                  s"col-${java.util.UUID.randomUUID()}")
                .putLong(graft.formats.delta.DeltaColumnMapping.IdKey,
                  nextId)
                .build())
          }
        val added = defaultMeta match {
          case Some(md) => added0.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(added0.metadata).withMetadata(md).build())
          case None => added0
        }
        StructType(cur.fields :+ added)
      case RenameColumn(from, to) =>
        require((fmt == "delta" && mapped) || fmt == "iceberg",
          renameRefusal(fmt, mapped))
        val f = field(cur, from)
        require(!partCols.contains(from),
          s"'$from' is a partition column — renaming it would orphan " +
            "the table layout")
        require(!cur.fieldNames.exists(_.equalsIgnoreCase(to)),
          s"column '$to' already exists")
        if (fmt == "iceberg") {
          // the rename is fieldId-keyed (IcebergSchemas.evolveWithOps
          // emits the rename op; the read side's shadow-coalesce serves
          // pre-rename files — IcebergRenames). Refused shapes mirror
          // the read guards so the DDL can never commit an unservable
          // table:
          require(!snap.table.partitionFields.exists(_.sourceField == f.name),
            s"'$from' is a partition-spec source field — the spec " +
              "resolves it by name; renaming it would orphan the spec")
          require(!f.metadata.contains("EXISTS_DEFAULT"),
            s"'$from' carries an initial-default — the existence fill " +
              "lands on the current name, so pre-rename files would " +
              "read the default instead of stored values; unservable")
          // a target name that EVER existed would pull the old column's
          // values into pre-rename files on name-resolved reads
          requireNeverNamedBefore(spark, path, to)
        }
        // delta: the physicalName metadata rides along, files stay
        // correct; iceberg: the graft.fieldId metadata rides along, the
        // sync emits a rename op for the same id
        StructType(cur.fields.map(x =>
          if (x.name == f.name) x.copy(name = to) else x))
      case AlterColumnType(name, ddl) =>
        val f = field(cur, name)
        require(!partCols.contains(f.name),
          s"'$name' is a partition column — its values are baked into " +
            "the table layout and cannot be re-typed")
        val to = DataType.fromDDL(ddl)
        require(f.dataType != to,
          s"column '$name' already has type ${to.simpleString}")
        require(widenAllowed(fmt, f.dataType, to),
          widenRefusal(fmt, f.dataType, to, name))
        val widened =
          if (fmt != "delta") f.copy(dataType = to)
          else {
            // real-delta interop (PROTOCOL.md §Type Widening): the field
            // records its change history under `delta.typeChanges`, and
            // the commit raises the protocol to carry the typeWidening
            // reader-writer feature — a reader that does not implement
            // widening REFUSES the table instead of misreading int files
            // under a long schema
            deltaTypeWidening = true
            val change = new org.apache.spark.sql.types.MetadataBuilder()
              .putString("fromType", deltaTypeName(f.dataType))
              .putString("toType", deltaTypeName(to))
              .build()
            val prior =
              if (f.metadata.contains("delta.typeChanges"))
                f.metadata.getMetadataArray("delta.typeChanges").toSeq
              else Nil
            f.copy(dataType = to,
              metadata = new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .putMetadataArray("delta.typeChanges",
                  (prior :+ change).toArray)
                .build())
          }
        StructType(cur.fields.map(x =>
          if (x.name == f.name) widened else x))
      case DropColumn(name) =>
        require((fmt == "delta" && mapped) || fmt == "iceberg",
          dropRefusal(fmt, mapped))
        val f = field(cur, name)
        require(!partCols.contains(name),
          s"'$name' is a partition column — drop the partitioning, " +
            "not the column")
        require(cur.fields.length > 1,
          s"cannot drop the only column '$name'")
        StructType(cur.fields.filterNot(_.name == f.name))
    }

    fmt match {
      case "delta" => alterDelta(spark, path, evolved, deltaConfigOverride,
        addFeature = if (deltaTypeWidening) Some("typeWidening") else None)
      case _ =>
        val target: graft.spi.ConversionTarget = fmt match {
          case "iceberg" =>
            new graft.formats.iceberg.IcebergConversionTarget(spark, path)
          case "hudi" =>
            new graft.formats.hudi.HudiConversionTarget(spark, path)
          case "paimon" =>
            new graft.formats.paimon.PaimonConversionTarget(spark, path)
        }
        val altered = snap.copy(table = snap.table.copy(
          schemaJson = evolved.json))
        // pin the planning snapshot: the empty-diff schema commit carries
        // the snapshot's file set forward, so a concurrent commit landing
        // since currentSnapshot() must fail the CAS loudly — a silent
        // rebase would diff its appends away
        val outcomes = TableFormatSync.syncSnapshot(Seq(target), altered,
          source.sourceFormat, expectBase = Some(snap.commitId))
        outcomes.find(_.status != "SUCCESS").foreach(o =>
          throw new IllegalStateException(s"ALTER TABLE failed: $o"))
    }
    Result(fmt, evolved)
  }

  /** `col` | `year(col)` | `month(col)` | `day(col)` | `hour(col)` |
    * `bucket(N, col)` → a [[PartitionFieldSpec]], validated against the
    * table schema.
    */
  private[graft] def parsePartitionTransform(ddl: String,
      schema: StructType): graft.model.PartitionFieldSpec = {
    import graft.model.{PartitionFieldSpec, Transform}
    val timeRe = """(?i)\s*(year|month|day|hour)\s*\(\s*(\w+)\s*\)\s*""".r
    val bucketRe = """(?i)\s*bucket\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)\s*""".r
    val identRe = """\s*(\w+)\s*""".r
    val spec = ddl match {
      case timeRe(t, c) => PartitionFieldSpec(c, t.toUpperCase)
      case bucketRe(n, c) =>
        PartitionFieldSpec(c, Transform.Bucket, numBuckets = Some(n.toInt))
      case identRe(c) => PartitionFieldSpec(c, Transform.Value)
      case other => throw new IllegalArgumentException(
        s"unrecognized partition transform '$other' — supported: col, " +
          "year(col), month(col), day(col), hour(col), bucket(N, col)")
    }
    require(schema.fieldNames.exists(_.equalsIgnoreCase(spec.sourceField)),
      s"no column '${spec.sourceField}' in the table schema")
    spec
  }

  /** Partition-spec evolution: re-commit the CURRENT snapshot under the
    * changed partitioning. Metadata-only — the target's spec-evolution
    * path archives the old spec under its id and existing manifests keep
    * theirs, so no data file moves.
    */
  private def runPartitionOp(spark: SparkSession, path: String,
      fmt: String, source: graft.spi.ConversionSource,
      snap: graft.model.TableSnapshot,
      add: Option[graft.model.PartitionFieldSpec],
      drop: Option[String]): Result = {
    require(fmt == "iceberg",
      s"ADD/DROP PARTITION FIELD is partition-spec evolution — an " +
        s"Iceberg capability; a $fmt table bakes its layout into paths " +
        "and cannot re-partition declaratively")
    val cur = snap.table.partitionFields
    val next = (add, drop) match {
      case (Some(p), _) =>
        require(!cur.exists(c => c.sourceField == p.sourceField &&
            c.transform == p.transform),
          s"partition field ${p.partitionColumnName} already in the spec")
        cur :+ p
      case (_, Some(name)) =>
        val hit = cur.find(c => c.partitionColumnName == name ||
          c.sourceField == name)
        require(hit.isDefined, s"no partition field '$name' in the " +
          s"current spec (${cur.map(_.partitionColumnName).mkString(", ")})")
        cur.filterNot(_ == hit.get)
      case _ => cur
    }
    val target = new graft.formats.iceberg.IcebergConversionTarget(
      spark, path)
    val altered = snap.copy(table = snap.table.copy(partitionFields = next))
    val outcomes = TableFormatSync.syncSnapshot(Seq(target), altered,
      source.sourceFormat, expectBase = Some(snap.commitId))
    outcomes.find(_.status != "SUCCESS").foreach(o =>
      throw new IllegalStateException(s"ALTER TABLE failed: $o"))
    Result(fmt, snap.table.schema)
  }

  private val MaxColumnIdKey = "delta.columnMapping.maxColumnId"

  /** Next column-mapping id: past the maxColumnId watermark AND every id
    * stamped in the live schema (the watermark survives drops, so a
    * re-used id can never alias a dropped column's data).
    */
  private def nextColumnId(spark: SparkSession, path: String,
      cur: StructType): Long = {
    val conf = HadoopConfs.session(spark)
    val versions = graft.formats.delta.DeltaLog.listVersions(path, conf)
    val watermark = graft.formats.delta.DeltaSnapshot
      .metadata(spark, path, versions)
      .flatMap(_.configuration.get(MaxColumnIdKey))
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(0L)
    val idKey = graft.formats.delta.DeltaColumnMapping.IdKey
    val inSchema = cur.fields.toSeq.flatMap(f =>
      if (f.metadata.contains(idKey))
        scala.util.Try(f.metadata.getLong(idKey)).toOption else None)
    (watermark +: inSchema).max + 1
  }

  private val IntegralRank = Map[DataType, Int](
    org.apache.spark.sql.types.ByteType -> 1,
    org.apache.spark.sql.types.ShortType -> 2,
    org.apache.spark.sql.types.IntegerType -> 3,
    org.apache.spark.sql.types.LongType -> 4)

  /** Widenings the graft READ path serves exactly: Spark 4's parquet
    * readers (vectorized and parquet-mr) up-cast int32/int64/float
    * columns to a wider requested type in the scan, so existing files
    * keep serving bit-exact values under the evolved schema. Everything
    * here is lossless: wider integral chains, byte/short/int → double
    * (exact in a 52-bit mantissa), float → double. long → double is NOT
    * here (loses precision past 2^53), nor is any narrowing.
    */
  private def losslessWiden(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if IntegralRank.contains(a) && IntegralRank.contains(b) =>
        IntegralRank(b) > IntegralRank(a)
      case (a, org.apache.spark.sql.types.DoubleType)
          if IntegralRank.get(a).exists(_ <= 3) => true
      case (org.apache.spark.sql.types.FloatType,
          org.apache.spark.sql.types.DoubleType) => true
      case (a: org.apache.spark.sql.types.DecimalType,
          b: org.apache.spark.sql.types.DecimalType) =>
        // Delta type-widening's decimal rule: integer digits never
        // shrink, scale never shrinks — every old value represents
        // exactly (the scan re-encodes across the int32/int64/binary
        // physical boundary)
        b.scale >= a.scale && (b.precision - b.scale) >= (a.precision - a.scale) &&
          (b.precision > a.precision || b.scale > a.scale)
      case _ => false
    }

  /** Per-format promotion matrix: the read path serves every
    * [[losslessWiden]] pair, but a format only accepts promotions ITS
    * own spec allows, so the metadata graft writes stays readable by the
    * format's native engines — Iceberg spec §Schema Evolution permits
    * exactly int→long and float→double (plus decimal precision); Delta
    * (type-widening feature), Hudi (Avro resolution, lossless subset)
    * and Paimon (numeric widening) accept the full lossless set.
    */
  private def widenAllowed(fmt: String, from: DataType, to: DataType)
      : Boolean = fmt match {
    case "iceberg" => (from, to) match {
      case (org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType) => true
      case (org.apache.spark.sql.types.FloatType,
        org.apache.spark.sql.types.DoubleType) => true
      case (a: org.apache.spark.sql.types.DecimalType,
          b: org.apache.spark.sql.types.DecimalType) =>
        // Iceberg spec: precision may grow, scale is FIXED
        a.scale == b.scale && b.precision > a.precision
      case _ => false
    }
    case _ => losslessWiden(from, to)
  }

  private def widenRefusal(fmt: String, from: DataType, to: DataType,
      name: String): String =
    if (fmt == "iceberg" && losslessWiden(from, to))
      s"ALTER COLUMN TYPE ${from.simpleString} -> ${to.simpleString} on " +
        s"'$name': the Iceberg spec (§Schema Evolution) only allows " +
        "int -> long, float -> double and same-scale decimal precision " +
        "growth — a wider promotion would write metadata real Iceberg " +
        "readers reject"
    else
      s"ALTER COLUMN TYPE ${from.simpleString} -> ${to.simpleString} on " +
        s"'$name' is not a lossless widening the parquet read path can " +
        "serve on already-written files — only wider integral types, " +
        "byte/short/int -> double, and float -> double are"

  private def field(s: StructType, name: String): StructField =
    s.fields.find(_.name == name).getOrElse(
      s.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$name' (columns: ${s.fieldNames.mkString(", ")})")))

  private def renameRefusal(fmt: String, mapped: Boolean): String =
    if (fmt == "delta" && !mapped)
      "RENAME COLUMN needs delta.columnMapping.mode=name — on an " +
        "unmapped table every existing file resolves columns by name " +
        "and the renamed column would read as null"
    else
      s"RENAME COLUMN is not supported on $fmt tables: the schema " +
        "plane has no field-id or physical-name indirection, so a " +
        "rename would null the column on every pre-rename file " +
        "(Delta with column mapping and Iceberg support it)"

  private def dropRefusal(fmt: String, mapped: Boolean): String =
    if (fmt == "delta" && !mapped)
      "DROP COLUMN needs delta.columnMapping.mode=name (delta-spark's " +
        "rule: without mapping, re-adding the name later would " +
        "resurrect the old values)"
    else
      s"DROP COLUMN is not supported on $fmt tables: the schema plane " +
        "keeps no drop history, so a later re-add of the same name " +
        "would silently resurrect old values"

  /** Iceberg ADD guard: name-resolved reads mean a column name that ever
    * existed would come back with its OLD values for old files — refuse
    * (scans every metadata version; versions are the commit count).
    */
  private def requireNeverNamedBefore(spark: SparkSession, path: String,
      name: String): Unit = {
    val head = graft.formats.iceberg.IcebergMetadata.currentVersion(path)
      .getOrElse(return)
    (1L to head).foreach { v =>
      val names = graft.formats.iceberg.IcebergMetadata.read(path, v)
        .schema.fieldNames
      require(!names.exists(_.equalsIgnoreCase(name)),
        s"column name '$name' existed in schema version $v — re-adding " +
          "it would resurrect old values on name-resolved reads " +
          "(drop-then-re-add needs Iceberg field-id reads)")
    }
  }

  /** Delta: one targeted metaData commit. Carries the existing protocol
    * forward untouched and CASes on the next version (a racing writer
    * fails this commit loudly; re-run the statement).
    */
  /** Delta logical type name for `delta.typeChanges` entries. */
  private def deltaTypeName(dt: DataType): String = dt match {
    case org.apache.spark.sql.types.ByteType => "byte"
    case org.apache.spark.sql.types.ShortType => "short"
    case org.apache.spark.sql.types.IntegerType => "integer"
    case org.apache.spark.sql.types.LongType => "long"
    case org.apache.spark.sql.types.FloatType => "float"
    case org.apache.spark.sql.types.DoubleType => "double"
    case d: org.apache.spark.sql.types.DecimalType =>
      s"decimal(${d.precision},${d.scale})"
    case other => other.typeName
  }

  private def alterDelta(spark: SparkSession, path: String,
      evolved: StructType,
      configOverride: Map[String, String] = Map.empty,
      addFeature: Option[String] = None): Unit = {
    import graft.formats.delta.{DeltaLog, DeltaSnapshot}
    val conf = HadoopConfs.session(spark)
    val versions = DeltaLog.listVersions(path, conf)
    val meta = DeltaSnapshot.metadata(spark, path, versions).getOrElse(
      throw new IllegalStateException(s"no Delta metaData at $path"))
    val proto: Map[String, Any] = addFeature match {
      case Some(feature) =>
        // feature-bearing ALTERs (type widening) escalate to table
        // features, enumerating the legacy-implied features on the way
        graft.formats.delta.DeltaDeletes.protocolWithFeature(
          spark, path, versions, feature)
      case None => DeltaSnapshot.protocolInfo(spark, path, versions)
        .map(p => Map[String, Any](
          "minReaderVersion" -> p.minReaderVersion,
          "minWriterVersion" -> p.minWriterVersion) ++
          (if (p.readerFeatures.nonEmpty)
            Map("readerFeatures" -> p.readerFeatures) else Map.empty) ++
          (if (p.writerFeatures.nonEmpty)
            Map("writerFeatures" -> p.writerFeatures) else Map.empty))
        .getOrElse(Map[String, Any](
          "minReaderVersion" -> 1, "minWriterVersion" -> 2))
    }
    val lines = Iterator(
      Jsons.toJson(Map("protocol" -> proto)),
      Jsons.toJson(Map("metaData" -> Map(
        "id" -> meta.id,
        "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
        "schemaString" -> evolved.json,
        "partitionColumns" -> meta.partitionColumns,
        "configuration" -> (meta.configuration ++ configOverride),
        "createdTime" -> meta.createdTime))),
      Jsons.toJson(Map("commitInfo" -> Map(
        "timestamp" -> System.currentTimeMillis(),
        "operation" -> "GRAFT ALTER TABLE",
        "operationParameters" -> Map.empty))))
    val next = versions.lastOption.map(_ + 1).getOrElse(0L)
    if (!DeltaLog.writeCommit(path, next, lines))
      throw new IllegalStateException(
        s"concurrent writer took Delta version $next at $path — " +
          "re-run the ALTER against the new head")
  }
}
