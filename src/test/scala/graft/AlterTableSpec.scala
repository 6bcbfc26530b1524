package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.delta.{DeltaColumnMapping, DeltaConversionSource}
import graft.sync.AlterTable
import graft.sync.AlterTable.{AddColumn, DropColumn, RenameColumn}

class AlterTableSpec extends SparkSuite {

  private def delta(prefix: String): String = {
    import spark.implicits._
    val t = tmpDir(prefix)
    graft.formats.delta.DeltaWrite.write(spark, t,
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "name")
        .repartition(2), overwrite = false)
    t
  }

  private def viaSync(prefix: String, fmt: String): String = {
    import spark.implicits._
    val data = tmpDir(s"${prefix}_data")
    (0L until 20L).map(i => (i, s"v$i")).toDF("id", "name")
      .repartition(2).write.mode("overwrite").parquet(data)
    val t = tmpDir(prefix)
    val src = new graft.sources.ParquetDirectorySource(spark, data, "t")
    val target: graft.spi.ConversionTarget = fmt match {
      case "iceberg" =>
        new graft.formats.iceberg.IcebergConversionTarget(spark, t)
      case "hudi" => new graft.formats.hudi.HudiConversionTarget(spark, t)
      case "paimon" =>
        new graft.formats.paimon.PaimonConversionTarget(spark, t)
    }
    val out = graft.sync.TableFormatSync.syncSnapshot(Seq(target),
      src.currentSnapshot(), src.sourceFormat)
    require(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    t
  }

  test("delta ADD COLUMN: nulls on old files, appendable after, " +
    "protocol untouched") {
    val t = delta("alter_delta")
    val r = AlterTable.run(spark, t, AddColumn("note", "string"))
    assert(r.format == "delta" &&
      r.schema.fieldNames.toSeq == Seq("id", "name", "note"))
    val df = new DeltaConversionSource(spark, t, "t").toDataFrame
    assert(df.columns.toSeq == Seq("id", "name", "note"))
    assert(df.filter(col("note").isNull).count() == 20)
    // appends may now carry the column
    import spark.implicits._
    graft.formats.delta.DeltaWrite.write(spark, t,
      Seq((100L, "x", "hello")).toDF("id", "name", "note"),
      overwrite = false)
    val after = new DeltaConversionSource(spark, t, "t").toDataFrame
    assert(after.filter(col("note") === "hello").count() == 1)
    // the ALTER commit must not stomp the protocol
    val conf = graft.util.HadoopConfs.session(spark)
    val proto = graft.formats.delta.DeltaSnapshot.protocolInfo(spark, t,
      graft.formats.delta.DeltaLog.listVersions(t, conf)).get
    assert(proto.minReaderVersion == 1 && proto.minWriterVersion == 2)
  }

  test("delta unmapped: RENAME and DROP refuse with the mapping rule") {
    val t = delta("alter_delta_refuse")
    val e1 = intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, RenameColumn("name", "label"))
    }
    assert(e1.getMessage.contains("columnMapping"))
    val e2 = intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, DropColumn("name"))
    }
    assert(e2.getMessage.contains("columnMapping"))
  }

  test("delta column-mapped: RENAME keeps old files readable; protocol " +
    "(2,5) carried forward") {
    // minimal mapped fixture (the ColumnMappingSpec shape)
    val t = tmpDir("alter_mapped")
    import spark.implicits._
    Seq((1L, "alpha"), (2L, "beta")).toDF("col-1", "col-2")
      .coalesce(1).write.mode("overwrite").parquet(t + "/stage")
    val part = new java.io.File(t + "/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(t, "f1.parquet"))
    val size = Files.size(Paths.get(t, "f1.parquet"))
    val logical = StructType(Seq(
      StructField("s_id", LongType, nullable = true,
        metadata = new MetadataBuilder()
          .putString(DeltaColumnMapping.PhysicalNameKey, "col-1")
          .putLong(DeltaColumnMapping.IdKey, 1L).build()),
      StructField("s_name", StringType, nullable = true,
        metadata = new MetadataBuilder()
          .putString(DeltaColumnMapping.PhysicalNameKey, "col-2")
          .putLong(DeltaColumnMapping.IdKey, 2L).build())))
    val schemaJson = logical.json.replace("\"", "\\\"")
    val log =
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"am-test","schemaString":"$schemaJson","partitionColumns":[],"configuration":{"${DeltaColumnMapping.ModeKey}":"name"},"createdTime":1}}
         |{"add":{"path":"f1.parquet","size":$size,"modificationTime":1000,"partitionValues":{},"dataChange":true}}
         |""".stripMargin
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.write(Paths.get(t, "_delta_log", "00000000000000000000.json"),
      log.getBytes(StandardCharsets.UTF_8))

    AlterTable.run(spark, t, RenameColumn("s_name", "s_label"))
    val df = new DeltaConversionSource(spark, t, "t").toDataFrame
    assert(df.columns.toSeq == Seq("s_id", "s_label"))
    assert(df.filter(col("s_label") === "beta").count() == 1,
      "renamed column must still serve the physical values")
    // DROP on mapped works too
    AlterTable.run(spark, t, DropColumn("s_id"))
    val df2 = new DeltaConversionSource(spark, t, "t").toDataFrame
    assert(df2.columns.toSeq == Seq("s_label"))
    val conf = graft.util.HadoopConfs.session(spark)
    val proto = graft.formats.delta.DeltaSnapshot.protocolInfo(spark, t,
      graft.formats.delta.DeltaLog.listVersions(t, conf)).get
    assert(proto.minReaderVersion == 2 && proto.minWriterVersion == 5,
      "mapped table's protocol must carry forward")
  }

  test("iceberg: ADD serves nulls, DROP hides, re-ADD of any historical " +
    "name refuses, RENAME refuses") {
    val t = viaSync("alter_ice", "iceberg")
    AlterTable.run(spark, t, AddColumn("flag", "int"))
    val src = new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "t")
    val df = src.toDataFrame
    assert(df.columns.toSeq == Seq("id", "name", "flag"))
    assert(df.filter(col("flag").isNull).count() == 20)

    AlterTable.run(spark, t, DropColumn("flag"))
    assert(new graft.formats.iceberg.IcebergConversionSource(spark, t, "t")
      .toDataFrame.columns.toSeq == Seq("id", "name"))

    val e = intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, AddColumn("flag", "int"))
    }
    assert(e.getMessage.contains("resurrect"))
  }

  test("iceberg RENAME COLUMN: fieldId-keyed, pre-rename files serve " +
    "under the new name, mixed populations coalesce, time travel works") {
    import graft.formats.iceberg.{IcebergMetadata, IcebergSchemas}
    val t = viaSync("alter_ice_ren", "iceberg")
    val idBefore = {
      val m = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
      IcebergSchemas.fieldId(m.schema("name"))
    }
    val r = AlterTable.run(spark, t, RenameColumn("name", "title"))
    assert(r.format == "iceberg" &&
      r.schema.fieldNames.toSeq == Seq("id", "title"))

    val m = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    // the rename kept the field id (spec §Schema Evolution) and archived
    // the pre-rename schema
    assert(IcebergSchemas.fieldId(m.schema("title")) == idBefore)
    assert(m.otherSchemas.exists(_.contains("\"name\":\"name\"")),
      m.otherSchemas.mkString(";"))

    // ALL files predate the rename: every stored value serves under the
    // new name (a name-resolved scan without the shadow pass nulls them)
    val src = new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "t")
    val df = src.toDataFrame
    assert(df.columns.toSeq == Seq("id", "title"))
    assert(df.filter(col("title").isNull).count() == 0)
    assert(df.filter(col("title") === "v3").count() == 1)

    // guards: renaming BACK to a historical name would resurrect old
    // files' values; re-ADDing the old name likewise
    val eBack = intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, RenameColumn("title", "name"))
    }
    assert(eBack.getMessage.contains("existed in schema version"),
      eBack.getMessage)
    val eReadd = intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, AddColumn("name", "string"))
    }
    assert(eReadd.getMessage.contains("resurrect"), eReadd.getMessage)

    // MIXED populations: UPDATE rewrites the touched file under the
    // CURRENT (renamed) schema while untouched files keep the old name
    val updated = graft.formats.iceberg.IcebergDeletes.updateWhere(
      spark, t, col("id") === 3L, Map("title" -> lit("renamed!")))
    assert(updated == 1L)
    val after = new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "t").toDataFrame
    assert(after.filter(col("title") === "renamed!").count() == 1)
    assert(after.filter(col("title").isNull).count() == 0)
    assert(after.count() == 20)

    // time travel to the pre-rename sequence serves all rows
    assert(src.toDataFrameAt(1L).count() == 20)
  }

  test("hudi + paimon: ADD COLUMN lands in the schema plane; " +
    "rename/drop refuse") {
    for (fmt <- Seq("hudi", "paimon")) {
      val t = viaSync(s"alter_$fmt", fmt)
      AlterTable.run(spark, t, AddColumn("extra", "bigint"))
      val src = graft.sources.CatalogConversionSource.fromPath(
        spark, t, "t")
      assert(src.currentTable().schema.fieldNames.toSeq ==
        Seq("id", "name", "extra"), s"$fmt schema")
      val df = graft.formats.delta.DeltaRead.toDataFrame(
        spark, src.currentSnapshot())
      assert(df.filter(col("extra").isNull).count() == 20, s"$fmt nulls")
      intercept[IllegalArgumentException] {
        AlterTable.run(spark, t, RenameColumn("name", "label"))
      }
      intercept[IllegalArgumentException] {
        AlterTable.run(spark, t, DropColumn("name"))
      }
    }
  }

  test("paimon: evolved schema rides schema-(N+1) and the snapshot " +
    "references it; old snapshots keep their schema") {
    val t = viaSync("alter_paimon_ids", "paimon")
    val before = graft.formats.paimon.PaimonFormat.latestSnapshotId(t).get
    AlterTable.run(spark, t, AddColumn("extra", "bigint"))
    val after = graft.formats.paimon.PaimonFormat.latestSnapshotId(t).get
    assert(after == before + 1)
    val snapNew = graft.formats.paimon.PaimonFormat.readSnapshot(t, after)
    val snapOld = graft.formats.paimon.PaimonFormat.readSnapshot(t, before)
    assert(snapNew.schemaId == snapOld.schemaId + 1)
    // time travel to the old snapshot serves the OLD schema
    val old = spark.read.format("graft")
      .option("versionAsOf", before.toString).load(t)
    assert(old.columns.toSeq == Seq("id", "name"))
  }

  test("ALTER COLUMN TYPE: pre-promotion files serve under the widened " +
    "schema, pruning stays correct, refusals hold per format") {
    import spark.implicits._
    import graft.sync.AlterTable.AlterColumnType
    val data = tmpDir("alter_widen_data")
    (0 until 40).map(i => (i, i * 0.5f)).toDF("k", "q")
      .repartition(2).write.mode("overwrite").parquet(data)
    for (fmt <- Seq("iceberg", "hudi", "paimon")) {
      val t = tmpDir(s"alter_widen_$fmt")
      val src = new graft.sources.ParquetDirectorySource(spark, data, "t")
      val target: graft.spi.ConversionTarget = fmt match {
        case "iceberg" =>
          new graft.formats.iceberg.IcebergConversionTarget(spark, t)
        case "hudi" => new graft.formats.hudi.HudiConversionTarget(spark, t)
        case "paimon" =>
          new graft.formats.paimon.PaimonConversionTarget(spark, t)
      }
      val out = graft.sync.TableFormatSync.syncSnapshot(Seq(target),
        src.currentSnapshot(), src.sourceFormat)
      require(out.forall(_.status == "SUCCESS"), out.mkString(";"))

      AlterTable.run(spark, t, AlterColumnType("k", "bigint"))
      AlterTable.run(spark, t, AlterColumnType("q", "double"))
      val df = spark.read.format("graft").load(t)
      assert(df.schema("k").dataType == LongType, fmt)
      assert(df.schema("q").dataType == DoubleType, fmt)
      // a point filter drives the stats plane: Iceberg's pre-promotion
      // manifests carry 4-byte int bounds that must decode (promoted)
      // under the widened schema, not underflow
      assert(df.filter(col("k") === 7L).count() == 1, fmt)
      assert(df.agg(sum("k")).head().getLong(0) == (0 until 40).sum, fmt)
      assert(df.agg(sum("q")).head().getDouble(0) ==
        (0 until 40).map(_ * 0.5).sum, fmt)
      // narrowing and lossy widening refuse (k is bigint now, so
      // k -> double is long -> double: lossy past 2^53)
      intercept[IllegalArgumentException](
        AlterTable.run(spark, t, AlterColumnType("k", "int")))
      intercept[IllegalArgumentException](
        AlterTable.run(spark, t, AlterColumnType("k", "double")))
    }
    // iceberg spec boundary: int -> double refused even though the read
    // path could serve it
    val iceT = tmpDir("alter_widen_ice2")
    val src2 = new graft.sources.ParquetDirectorySource(spark, data, "t")
    val out2 = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, iceT)),
      src2.currentSnapshot(), src2.sourceFormat)
    require(out2.forall(_.status == "SUCCESS"), out2.mkString(";"))
    val e = intercept[IllegalArgumentException](
      AlterTable.run(spark, iceT, AlterColumnType("k", "double")))
    assert(e.getMessage.contains("Iceberg spec"))

    // delta end-to-end: widen, then append values past int range — old
    // int files and the new long file serve in one scan
    val dt = tmpDir("alter_widen_delta")
    graft.formats.delta.DeltaWrite.write(spark, dt,
      (0 until 40).map(i => (i, i * 0.5f)).toDF("k", "q").repartition(2),
      overwrite = false)
    AlterTable.run(spark, dt, AlterColumnType("k", "bigint"))
    AlterTable.run(spark, dt, AlterColumnType("q", "double"))
    graft.formats.delta.DeltaWrite.write(spark, dt,
      Seq((3000000000L, 99.5)).toDF("k", "q"), overwrite = false)
    val ddf = spark.read.format("graft").load(dt)
    assert(ddf.count() == 41)
    assert(ddf.filter(col("k") === 3000000000L).count() == 1)
    assert(ddf.agg(sum("k")).head().getLong(0) ==
      (0 until 40).sum.toLong + 3000000000L)
    // real-delta interop: the widened table carries the typeWidening
    // reader-writer feature (a non-implementing reader refuses instead
    // of misreading int files under a long schema) and the field records
    // its change history under delta.typeChanges
    val conf = graft.util.HadoopConfs.session(spark)
    val proto = graft.formats.delta.DeltaSnapshot.protocolInfo(spark, dt,
      graft.formats.delta.DeltaLog.listVersions(dt, conf)).get
    assert(proto.minReaderVersion >= 3 && proto.minWriterVersion >= 7,
      proto.toString)
    assert(proto.readerFeatures.contains("typeWidening"), proto.toString)
    assert(proto.writerFeatures.contains("typeWidening"), proto.toString)
    // legacy-implied features enumerated on the way up (PROTOCOL.md)
    assert(proto.writerFeatures.contains("appendOnly"), proto.toString)
    val meta = graft.formats.delta.DeltaSnapshot.metadata(spark, dt,
      graft.formats.delta.DeltaLog.listVersions(dt, conf)).get
    val kField = meta.schema("k")
    assert(kField.metadata.contains("delta.typeChanges"))
    val changes = kField.metadata.getMetadataArray("delta.typeChanges")
    assert(changes.length == 1 &&
      changes.head.getString("fromType") == "integer" &&
      changes.head.getString("toType") == "long", changes.mkString(";"))
  }

  test("ALTER COLUMN TYPE decimals: precision growth serves everywhere, " +
    "scale growth is Delta-rule only (Iceberg pins the scale)") {
    import spark.implicits._
    import graft.sync.AlterTable.AlterColumnType
    val data = tmpDir("alter_dec_data")
    Seq("1.25", "7.50", "19.75").toDF("s")
      .select(col("s").cast("decimal(10,2)").as("amt"),
        monotonically_increasing_id().as("k"))
      .coalesce(1).write.mode("overwrite").parquet(data)

    // delta: precision AND scale growth (integer digits never shrink)
    val dt = tmpDir("alter_dec_delta")
    graft.formats.delta.DeltaWrite.write(spark, dt,
      spark.read.parquet(data), overwrite = false)
    AlterTable.run(spark, dt, AlterColumnType("amt", "decimal(14,4)"))
    val ddf = spark.read.format("graft").load(dt)
    assert(ddf.schema("amt").dataType == DecimalType(14, 4))
    assert(ddf.agg(sum("amt")).head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("28.50")) == 0)
    // shrinking integer digits is lossy -> refused
    intercept[IllegalArgumentException](
      AlterTable.run(spark, dt, AlterColumnType("amt", "decimal(14,6)")))

    // iceberg: same-scale precision growth only
    val it = tmpDir("alter_dec_ice")
    val src = new graft.sources.ParquetDirectorySource(spark, data, "t")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, it)),
      src.currentSnapshot(), src.sourceFormat)
    require(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    AlterTable.run(spark, it, AlterColumnType("amt", "decimal(16,2)"))
    val idf = spark.read.format("graft").load(it)
    assert(idf.schema("amt").dataType == DecimalType(16, 2))
    assert(idf.agg(sum("amt")).head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("28.50")) == 0)
    val e = intercept[IllegalArgumentException](
      AlterTable.run(spark, it, AlterColumnType("amt", "decimal(20,4)")))
    assert(e.getMessage.contains("Iceberg spec"))
  }

  test("guard rails: partition columns, duplicate adds, unknown " +
    "columns, last column") {
    val t = delta("alter_guards")
    intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, AddColumn("name", "string"))
    }
    intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, AddColumn("a.b", "string"))
    }
    intercept[IllegalArgumentException] {
      AlterTable.run(spark, t, RenameColumn("ghost", "x"))
    }
  }
  test("delta column-mapped ADD COLUMN: field stamped with physicalName " +
    "+ id, maxColumnId bumped, later RENAME keeps the physical name") {
    val t = tmpDir("alter_mapped_add")
    import spark.implicits._
    Seq((1L, "alpha"), (2L, "beta")).toDF("col-1", "col-2")
      .coalesce(1).write.mode("overwrite").parquet(t + "/stage")
    val part = new java.io.File(t + "/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(t, "f1.parquet"))
    val size = Files.size(Paths.get(t, "f1.parquet"))
    val logical = StructType(Seq(
      StructField("s_id", LongType, nullable = true,
        metadata = new MetadataBuilder()
          .putString(DeltaColumnMapping.PhysicalNameKey, "col-1")
          .putLong(DeltaColumnMapping.IdKey, 1L).build()),
      StructField("s_name", StringType, nullable = true,
        metadata = new MetadataBuilder()
          .putString(DeltaColumnMapping.PhysicalNameKey, "col-2")
          .putLong(DeltaColumnMapping.IdKey, 2L).build())))
    val schemaJson = logical.json.replace("\"", "\\\"")
    val log =
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"ama-test","schemaString":"$schemaJson","partitionColumns":[],"configuration":{"${DeltaColumnMapping.ModeKey}":"name","delta.columnMapping.maxColumnId":"2"},"createdTime":1}}
         |{"add":{"path":"f1.parquet","size":$size,"modificationTime":1000,"partitionValues":{},"dataChange":true}}
         |""".stripMargin
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.write(Paths.get(t, "_delta_log", "00000000000000000000.json"),
      log.getBytes(StandardCharsets.UTF_8))

    val r = AlterTable.run(spark, t, AddColumn("note", "string"))
    val added = r.schema.fields.last
    assert(added.name == "note")
    // a mapped table's new field MUST carry its own mapping metadata —
    // delta-spark rejects mapped schemas with unstamped fields, and an
    // implied (name-derived) physical name would shift on a later rename
    assert(added.metadata.contains(DeltaColumnMapping.PhysicalNameKey))
    val phys = added.metadata.getString(DeltaColumnMapping.PhysicalNameKey)
    assert(phys.startsWith("col-") && phys != "note")
    assert(added.metadata.getLong(DeltaColumnMapping.IdKey) == 3L)
    // the id watermark advanced in the table configuration
    val conf = graft.util.HadoopConfs.session(spark)
    val meta = graft.formats.delta.DeltaSnapshot.metadata(spark, t,
      graft.formats.delta.DeltaLog.listVersions(t, conf)).get
    assert(meta.configuration.get("delta.columnMapping.maxColumnId")
      .contains("3"))

    // rename of the added column rides the SAME physical name: the
    // (empty) pre-rename files keep resolving it identically
    AlterTable.run(spark, t, RenameColumn("note", "remark"))
    val after = new DeltaConversionSource(spark, t, "t")
      .currentSnapshot().table.schema
    val renamed = after.fields.last
    assert(renamed.name == "remark" &&
      renamed.metadata.getString(DeltaColumnMapping.PhysicalNameKey) == phys)
    // and the table still reads: old file rows serve null for the column
    val df = new DeltaConversionSource(spark, t, "t").toDataFrame
    assert(df.columns.toSeq == Seq("s_id", "s_name", "remark"))
    assert(df.filter(col("remark").isNull).count() == 2)
  }

  test("iceberg ADD/DROP PARTITION FIELD evolves the spec via SQL, " +
    "metadata-only") {
    import graft.formats.iceberg.IcebergMetadata
    val gs = graft.sql.GraftSql.session(spark)
    val t = viaSync("alter_ice_part", "iceberg")
    gs.sql(s"GRAFT ALTER TABLE '$t' ADD PARTITION FIELD bucket(8, id)")
    val m1 = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(m1.defaultSpecId == 1, s"spec id ${m1.defaultSpecId}")
    assert(m1.partitionSpec.map(_.partitionColumnName) == Seq("id_bucket"))
    assert(m1.partitionSpec.head.numBuckets.contains(8))
    // metadata-only: no data file moved, every row still serves
    val src1 = new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "t")
    assert(src1.toDataFrame.count() == 20)

    gs.sql(s"GRAFT ALTER TABLE '$t' ADD PARTITION FIELD day(id)")
    val m2 = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(m2.defaultSpecId == 2 &&
      m2.partitionSpec.map(_.transform) == Seq("BUCKET", "DAY"))

    gs.sql(s"GRAFT ALTER TABLE '$t' DROP PARTITION FIELD id_bucket")
    val m3 = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(m3.defaultSpecId == 3 &&
      m3.partitionSpec.map(_.transform) == Seq("DAY"))
    assert(m3.otherSpecs.size == 3, "every historical spec preserved")
    assert(new graft.formats.iceberg.IcebergConversionSource(spark, t, "t")
      .toDataFrame.count() == 20)

    // refusals: unknown column, duplicate field, non-iceberg format
    intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$t' ADD PARTITION FIELD nope")
    }
    intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$t' ADD PARTITION FIELD day(id)")
    }
    val d = delta("alter_delta_part")
    val e = intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$d' ADD PARTITION FIELD id")
    }
    assert(e.getMessage.contains("Iceberg capability"), e.getMessage)
  }
}
