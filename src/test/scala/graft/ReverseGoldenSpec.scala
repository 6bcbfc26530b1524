package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

import graft.formats.delta.DeltaConversionTarget
import graft.formats.hudi.{HudiConversionTarget, HudiTimeline}
import graft.formats.iceberg.{IcebergConversionTarget, IcebergMetadata}
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync
import graft.util.Jsons

/** REVERSE golden conformance: metadata graft WRITES, structurally diffed
  * against what the REAL format writers produced for the same data — the
  * direction GoldenFixtureSpec (read side) cannot cover, and the
  * reference's actual interop contract
  * (ITConversionController.java:950-1027: targets must be readable by the
  * real format libraries). The real libraries are absent in this sandbox,
  * so the closest in-env check is a field-level diff against their
  * checked-in output, with non-deterministic fields (uuids, clocks,
  * engine-specific commitInfo) excluded by name.
  */
class ReverseGoldenSpec extends SparkSuite {

  private def golden(name: String): String =
    getClass.getResource(s"/golden/$name").getPath

  private val DeltaDataFile =
    "part-00000-6ccb71bc-9cc1-4226-a7b5-f752edbedee6-c000.snappy.parquet"
  private val HudiDataFile =
    "b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet"

  private def jsonLines(path: String): Seq[JsonNode] =
    Files.readAllLines(Paths.get(path)).asScala.filter(_.nonEmpty)
      .map(Jsons.mapper.readTree(_)).toSeq

  /** Copy one golden data file into a fresh table dir and sync it in-place
    * through the given target (the reference's layout: source data and
    * target metadata share one directory).
    */
  private def syncInPlace(goldenDir: String, dataFile: String, name: String,
      mkTarget: String => graft.spi.ConversionTarget): String = {
    val table = tmpDir(s"rev_$name")
    Files.copy(Paths.get(goldenDir, dataFile), Paths.get(table, dataFile))
    val src = new ParquetDirectorySource(spark, table, name)
    val out = TableFormatSync.syncSnapshot(Seq(mkTarget(table)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    table
  }

  test("graft-written Delta commit matches delta-spark action-by-action") {
    val goldenDir = golden("delta_dimGeography")
    val table = syncInPlace(goldenDir, DeltaDataFile, "dimGeography",
      new DeltaConversionTarget(spark, _))

    val mine = jsonLines(s"$table/_delta_log/00000000000000000000.json")
    val real = jsonLines(s"$goldenDir/_delta_log/00000000000000000000.json")
    assert(mine.size == real.size)          // protocol, metaData, add, commitInfo
    def byKind(ls: Seq[JsonNode]) = ls.map(n => n.fieldNames().next() -> n).toMap
    val m = byKind(mine); val r = byKind(real)
    assert(m.keySet == r.keySet, s"${m.keySet} vs ${r.keySet}")

    // protocol: byte-identical
    assert(m("protocol") == r("protocol"))

    // metaData: same format/schema/partitioning; graft's extra table
    // properties must all be namespaced (no pollution of the real keyspace)
    val mm = m("metaData").get("metaData"); val rm = r("metaData").get("metaData")
    assert(mm.get("format") == rm.get("format"))
    assert(mm.get("schemaString").asText == rm.get("schemaString").asText)
    assert(mm.get("partitionColumns") == rm.get("partitionColumns"))
    // graft.* plus the sync-metadata key (the reference's own convention:
    // an engine-named table property, TableSyncMetadata.XTABLE_METADATA)
    val extraCfg = mm.get("configuration").properties().asScala.map(_.getKey)
    assert(extraCfg.forall(k => k.startsWith("graft.") ||
      k == graft.spi.SyncMetadata.PropertyKey), extraCfg.mkString(","))

    // add: same relative path, size, partitionValues; stats numerically
    // identical to what delta-spark computed from the data
    val ma = m("add").get("add"); val ra = r("add").get("add")
    assert(ma.get("path").asText == ra.get("path").asText)
    assert(ma.get("size").asLong == ra.get("size").asLong)
    assert(ma.get("partitionValues") == ra.get("partitionValues"))
    assert(ma.get("dataChange").asBoolean && ra.get("dataChange").asBoolean)
    val ms = Jsons.mapper.readTree(ma.get("stats").asText)
    val rs = Jsons.mapper.readTree(ra.get("stats").asText)
    assert(ms.get("numRecords") == rs.get("numRecords"))
    assert(ms.get("nullCount") == rs.get("nullCount"))
    assert(ms.get("minValues") == rs.get("minValues"))
    assert(ms.get("maxValues") == rs.get("maxValues"))

    // commitInfo: required operational fields present (values are
    // engine-specific by design). Excluded from the diff by necessity:
    // metaData.id/createdTime (fresh uuid/clock), add.modificationTime
    // (file copy time), commitInfo engine fields.
    assert(m("commitInfo").get("commitInfo").has("timestamp"))
    assert(m("commitInfo").get("commitInfo").has("operation"))
  }

  test("graft-written Hudi instant matches real Hudi 0.14 structurally") {
    val goldenDir = golden("hudi_dimCustomer")
    val table = syncInPlace(goldenDir, HudiDataFile, "hudi_dimCustomer",
      new HudiConversionTarget(spark, _))

    val instants = HudiTimeline.listInstants(table)
    assert(instants.size == 1)
    val instant = instants.head
    assert(instant.matches("\\d{17}"), instant)   // yyyyMMddHHmmssSSS
    // full state machine on disk, like the real timeline: requested →
    // inflight (suffix-less for commit) → completed
    for (f <- Seq(s"$instant.commit", s"$instant.commit.requested",
        s"$instant.inflight"))
      assert(Files.exists(Paths.get(table, ".hoodie", f)), f)

    val mine = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(table, ".hoodie", s"$instant.commit")))
    val real = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(goldenDir, ".hoodie", "20231105172136406.commit")))
    for (k <- Seq("partitionToWriteStats", "compacted", "operationType",
        "extraMetadata"))
      assert(mine.has(k) && real.has(k), k)
    assert(mine.get("partitionToWriteStats").properties().asScala
      .map(_.getKey).toSet ==
      real.get("partitionToWriteStats").properties().asScala
        .map(_.getKey).toSet)

    val mStat = mine.get("partitionToWriteStats").get("").get(0)
    val rStat = real.get("partitionToWriteStats").get("").get(0)
    // graft invents no writeStat fields: everything it writes exists in
    // the real writer's stat record
    val mineFields = mStat.properties().asScala.map(_.getKey).toSet
    val realFields = rStat.properties().asScala.map(_.getKey).toSet
    assert(mineFields.subsetOf(realFields),
      s"extra fields: ${mineFields -- realFields}")
    for (k <- Seq("fileId", "path", "numWrites", "fileSizeInBytes",
        "totalWriteBytes"))
      assert(mineFields.contains(k), k)
    // the data file already follows Hudi base-file naming, so the file
    // group id must be the one embedded in the name — a real reader
    // derives it from there
    assert(mStat.get("fileId").asText == rStat.get("fileId").asText)
    assert(mStat.get("path").asText == rStat.get("path").asText)
    assert(mStat.get("numWrites").asLong == rStat.get("numWrites").asLong)
    assert(mStat.get("fileSizeInBytes").asLong ==
      rStat.get("fileSizeInBytes").asLong)

    // extraMetadata.schema must be AVRO (HoodieCommitMetadata SCHEMA_KEY —
    // a real TableSchemaResolver parses it) with the real schema's fields
    val mineAvro = new org.apache.avro.Schema.Parser().parse(
      mine.get("extraMetadata").get("schema").asText)
    val realAvro = new org.apache.avro.Schema.Parser().parse(
      real.get("extraMetadata").get("schema").asText)
    assert(mineAvro.getType == org.apache.avro.Schema.Type.RECORD)
    // the golden parquet physically carries Hudi's five _hoodie_* meta
    // columns; real Hudi's SCHEMA_KEY is the logical writer schema without
    // them, while a generic parquet source correctly surfaces them as data
    assert(mineAvro.getFields.asScala.map(_.name)
      .filterNot(_.startsWith("_hoodie_")).toSet ==
      realAvro.getFields.asScala.map(_.name).toSet)

    // hoodie.properties: every key graft writes exists in the real file,
    // with identical values for the version/type/layout contract keys
    def props(p: String): Map[String, String] =
      Files.readAllLines(Paths.get(p)).asScala.filterNot(_.startsWith("#"))
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    val mp = props(s"$table/.hoodie/hoodie.properties")
    val rp = props(s"$goldenDir/.hoodie/hoodie.properties")
    assert(mp.keySet.subsetOf(rp.keySet),
      s"extra keys: ${mp.keySet -- rp.keySet}")
    for (k <- Seq("hoodie.table.type", "hoodie.table.version",
        "hoodie.timeline.layout.version"))
      assert(mp(k) == rp(k), k)
  }

  test("graft-written Iceberg manifests agree field-id-for-field-id with " +
    "the independently-authored spec fixture") {
    // two transcriptions of the same public spec — the Scala writer and
    // tools/make_golden_iceberg.py (python stdlib, zero shared code) —
    // diffed at the avro-schema level: every reserved field id one
    // emits must carry the SAME name in the other (real readers resolve
    // by id, so a name drift is an interop break; ids graft doesn't
    // write, like nan_value_counts, are allowed to be fixture-only).
    val fixDir = new java.io.File(
      "src/test/resources/golden/iceberg_trades/metadata").getAbsolutePath
    def avroFieldIds(schema: org.apache.avro.Schema,
        prefix: String = ""): Map[Int, String] = {
      import org.apache.avro.Schema.Type._
      def unwrap(s: org.apache.avro.Schema): org.apache.avro.Schema =
        if (s.getType == UNION)
          s.getTypes.asScala.find(_.getType != NULL).get else s
      schema.getFields.asScala.flatMap { f =>
        val id = Option(f.getObjectProp("field-id"))
          .collect { case n: Number => n.intValue() }
        val base = id.map(_ -> f.name).toMap
        val nested = unwrap(f.schema()) match {
          case r if r.getType == RECORD => avroFieldIds(r, f.name + ".")
          case a if a.getType == ARRAY &&
              a.getElementType.getType == RECORD =>
            avroFieldIds(a.getElementType, f.name + ".")
          case _ => Map.empty[Int, String]
        }
        base ++ nested
      }.toMap
    }
    def writerSchema(path: String): org.apache.avro.Schema = {
      val r = new DataFileReader[GenericRecord](new java.io.File(path),
        new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val fixManifest = writerSchema(
      s"$fixDir/11111111-2222-3333-4444-555555555555-m0.avro")
    val fixList = writerSchema(
      s"$fixDir/snap-4910258362197584316-1-11111111-2222-3333-4444-" +
        "555555555555.avro")
    val fixEntryIds = avroFieldIds(fixManifest)
    val fixListIds = avroFieldIds(fixList)
    // the schema the writer ACTUALLY emits since r12 (spec dialect:
    // typed partition struct, k_v-array stat maps with ids 117-130)
    val graftEntryIds = avroFieldIds(
      graft.formats.iceberg.IcebergManifests.specEntrySchema(
        org.apache.spark.sql.types.StructType(Nil), Nil))
    val graftListIds = avroFieldIds(
      graft.formats.iceberg.IcebergManifests.ManifestFileSchema)

    // engine extensions live OUTSIDE the reserved ranges
    val extensions = graftEntryIds.keySet.filter(_ >= 1000)
    for ((id, name) <- graftEntryIds if !extensions.contains(id)) {
      assert(fixEntryIds.get(id).map(_.split('.').last)
        .contains(name.split('.').last),
        s"manifest_entry field-id $id: graft says '$name', " +
          s"fixture says '${fixEntryIds.get(id)}'")
    }
    for ((id, name) <- graftListIds) {
      assert(fixListIds.get(id).contains(name),
        s"manifest_file field-id $id: graft says '$name', " +
          s"fixture says '${fixListIds.get(id)}'")
    }

    // and the BOUND ENCODINGS agree: graft re-syncs the fixture's own
    // data file and must reproduce the fixture's lower/upper bounds
    // value-for-value (both sides decode through the spec's
    // little-endian single-value binary)
    val fixSrc = new graft.formats.iceberg.IcebergConversionSource(spark,
      new java.io.File("src/test/resources/golden/iceberg_trades")
        .getAbsolutePath, "trades")
    val fixStats = fixSrc.currentSnapshot().files.collect().head
      .columnStats.map(s => s.field -> (s.min, s.max)).toMap
    val re = tmpDir("rev_ice_indep")
    Files.copy(
      Paths.get(new java.io.File(
        "src/test/resources/golden/iceberg_trades/data").getAbsolutePath,
        "00000-0-11111111-2222-3333-4444-555555555555-00001.parquet"),
      Paths.get(re, "trades.parquet"))
    val src = new ParquetDirectorySource(spark, re, "trades")
    val out = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, re)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val reStats = new graft.formats.iceberg.IcebergConversionSource(
      spark, re, "trades").currentSnapshot().files.collect().head
      .columnStats.map(s => s.field -> (s.min, s.max)).toMap
    for ((f, mm) <- fixStats)
      assert(reStats.get(f).contains(mm),
        s"bounds for '$f': fixture $mm, graft resync ${reStats.get(f)}")
  }

  test("graft-written Paimon JSON planes diff clean against the " +
    "independently-authored fixture") {
    // sync the FIXTURE'S OWN data file through the Paimon target, then
    // field-diff graft's snapshot-N/schema-N JSON against the fixture's
    // (two independent implementations of the same documented layout;
    // volatile fields — ids, clocks, uuids, manifest names — compared by
    // SHAPE, stable fields by value)
    val fixDir = new java.io.File(
      "src/test/resources/golden/paimon_orders").getAbsolutePath
    val table = tmpDir("rev_paimon")
    Files.copy(
      Paths.get(fixDir,
        "bucket-0/data-77777777-8888-9999-aaaa-bbbbbbbbbbbb-0.parquet"),
      Paths.get(table, "orders.parquet"))
    val src = new ParquetDirectorySource(spark, table, "orders")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.paimon.PaimonConversionTarget(spark, table)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    val fixSnap = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(fixDir, "snapshot/snapshot-1")))
    val gSnap = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(table, "snapshot/snapshot-1")))
    // every field graft writes must exist in the real-shaped fixture
    // under the same name (graftMetadata is the documented engine
    // extension; real readers ignore unknown fields)
    gSnap.properties().asScala.map(_.getKey)
      .filterNot(_ == "graftMetadata").foreach { k =>
        assert(fixSnap.has(k), s"snapshot field '$k' not in real shape")
      }
    assert(gSnap.get("version").asInt == fixSnap.get("version").asInt)
    assert(gSnap.get("commitKind").asText == "APPEND")
    // real Paimon's running row accounting, same data -> same counts
    assert(gSnap.get("totalRecordCount").asLong ==
      fixSnap.get("totalRecordCount").asLong)
    assert(gSnap.get("deltaRecordCount").asLong ==
      fixSnap.get("deltaRecordCount").asLong)
    // the real shape: manifest lists are BARE names under manifest/
    assert(!gSnap.get("baseManifestList").asText.contains("/"),
      gSnap.get("baseManifestList").asText)
    assert(!gSnap.get("deltaManifestList").asText.contains("/"))
    assert(Files.exists(Paths.get(table, "manifest",
      gSnap.get("deltaManifestList").asText)))

    val fixSchema = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(fixDir, "schema/schema-0")))
    val gSchema = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(table, "schema/schema-0")))
    gSchema.properties().asScala.map(_.getKey).foreach { k =>
      assert(fixSchema.has(k), s"schema field '$k' not in real shape")
    }
    // same data -> same Flink-SQL type strings, field for field
    val fixTypes = fixSchema.get("fields").elements().asScala
      .map(f => f.get("name").asText ->
        f.get("type").asText.stripSuffix(" NOT NULL")).toMap
    gSchema.get("fields").elements().asScala.foreach { f =>
      val n = f.get("name").asText
      assert(fixTypes.get(n).contains(
        f.get("type").asText.stripSuffix(" NOT NULL")),
        s"type drift on '$n': graft ${f.get("type").asText}, " +
          s"fixture ${fixTypes.get(n)}")
    }
    assert(gSchema.get("highestFieldId").asInt ==
      fixSchema.get("highestFieldId").asInt)
    // the hint files real Paimon maintains
    assert(Files.exists(Paths.get(table, "snapshot/LATEST")))
    // and graft READS BACK its own commit identically to the fixture
    val re = new graft.formats.paimon.PaimonConversionSource(
      spark, table, "orders").toDataFrame
    import org.apache.spark.sql.functions.sum
    assert(re.count() == 90)
    assert(re.agg(sum("order_id")).head().getLong(0) == 4095L)
  }

  test("graft's evolved Paimon schema chain diffs clean against the " +
    "independently-authored evolved fixture") {
    import org.apache.spark.sql.functions.{col, lit, sum, when}
    import spark.implicits._
    // same history as tools/make_golden_paimon_evolved.py: 50 rows under
    // schema-0, ADD COLUMN channel, 30 more rows carrying it
    val fixDir = new java.io.File(
      "src/test/resources/golden/paimon_orders_evolved").getAbsolutePath
    val table = tmpDir("rev_paimon_evo")
    (1 to 50).toDF("order_id")
      .select(col("order_id").cast("long"),
        when(col("order_id") % 2 === 1, "EU").otherwise("US").as("region"),
        (col("order_id") * lit(1.5)).as("amount"))
      .coalesce(1).write.parquet(s"$table/stage1")
    Files.move(
      new java.io.File(s"$table/stage1").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath,
      Paths.get(table, "orders1.parquet"))
    val src1 = new ParquetDirectorySource(spark, table, "orders_evolved")
    val out1 = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.paimon.PaimonConversionTarget(spark, table)),
      src1.currentSnapshot(), src1.sourceFormat)
    assert(out1.forall(_.status == "SUCCESS"), out1.mkString(";"))

    (101 to 130).toDF("order_id")
      .select(col("order_id").cast("long"), lit("APAC").as("region"),
        (col("order_id") * lit(2.5)).as("amount"),
        when(col("order_id") % 2 === 1, "web").otherwise("app")
          .as("channel"))
      .coalesce(1).write.parquet(s"$table/stage2")
    Files.move(
      new java.io.File(s"$table/stage2").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath,
      Paths.get(table, "orders2.parquet"))
    val src2 = new ParquetDirectorySource(spark, table, "orders_evolved")
    val out2 = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.paimon.PaimonConversionTarget(spark, table)),
      src2.currentSnapshot(), src2.sourceFormat)
    assert(out2.forall(_.status == "SUCCESS"), out2.mkString(";"))

    // evolution must ride the schema-N chain exactly like the fixture:
    // schema-1 exists, carries the new field under the NEXT field id,
    // and the head snapshot points at schemaId 1
    assert(Files.exists(Paths.get(table, "schema/schema-1")),
      "second sync with a wider schema must write schema-1")
    val fixS1 = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(fixDir, "schema/schema-1")))
    val gS1 = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(table, "schema/schema-1")))
    gS1.properties().asScala.map(_.getKey).foreach { k =>
      assert(fixS1.has(k), s"schema-1 field '$k' not in real shape")
    }
    assert(gS1.get("id").asInt == 1)
    val gChan = gS1.get("fields").elements().asScala
      .find(_.get("name").asText == "channel")
    assert(gChan.isDefined, "channel missing from graft's schema-1")
    assert(gChan.get.get("type").asText.startsWith("STRING"))
    assert(gS1.get("highestFieldId").asInt ==
      fixS1.get("highestFieldId").asInt)
    val headId = graft.formats.paimon.PaimonFormat
      .latestSnapshotId(table).get
    val headSnap = graft.formats.paimon.PaimonFormat
      .readSnapshot(table, headId)
    assert(headSnap.schemaId == 1L, s"head schemaId ${headSnap.schemaId}")

    // read-back parity with the fixture's own numbers: same history,
    // same serving rules (old files read the added column as null)
    val re = new graft.formats.paimon.PaimonConversionSource(
      spark, table, "orders_evolved").toDataFrame
    assert(re.count() == 80)
    assert(re.agg(sum("order_id")).head().getLong(0) == 4740L)
    assert(re.filter(col("channel").isNull).count() == 50)
  }

  test("graft's column-mapping RENAME metaData diffs clean against the " +
    "real-writer-shaped golden") {
    import org.apache.spark.sql.types._
    import graft.formats.delta.{DeltaColumnMapping, DeltaConversionSource}
    // build a mapped table the way delta-spark lays one out, rename
    // through graft's ALTER path, then diff the authored metaData action
    // against the golden fixture's own RENAME metaData (v1)
    val table = tmpDir("rev_delta_rename")
    import spark.implicits._
    Seq((1L, "ada"), (2L, "bob"), (3L, "cyd"))
      .toDF("col-aa11", "col-bb22")
      .coalesce(1).write.parquet(s"$table/stage")
    Files.move(
      new java.io.File(s"$table/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath,
      Paths.get(table, "f1.parquet"))
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true,
        metadata = new MetadataBuilder()
          .putString(DeltaColumnMapping.PhysicalNameKey, "col-aa11")
          .putLong(DeltaColumnMapping.IdKey, 1L).build()),
      StructField("name", StringType, nullable = true,
        metadata = new MetadataBuilder()
          .putString(DeltaColumnMapping.PhysicalNameKey, "col-bb22")
          .putLong(DeltaColumnMapping.IdKey, 2L).build())))
    val header = Seq(
      Jsons.toJson(Map("protocol" ->
        Map("minReaderVersion" -> 2, "minWriterVersion" -> 5))),
      Jsons.toJson(Map("metaData" -> Map(
        "id" -> "rev-rename", "format" ->
          Map("provider" -> "parquet", "options" -> Map.empty),
        "schemaString" -> logical.json, "partitionColumns" -> Nil,
        "configuration" -> Map(
          DeltaColumnMapping.ModeKey -> "name",
          "delta.columnMapping.maxColumnId" -> "2"),
        "createdTime" -> 1L))),
      Jsons.toJson(Map("add" -> Map(
        "path" -> "f1.parquet",
        "partitionValues" -> Map.empty,
        "size" -> Files.size(Paths.get(table, "f1.parquet")),
        "modificationTime" -> 1000L, "dataChange" -> true))))
    assert(graft.formats.delta.DeltaLog.writeCommit(
      table, 0L, header.iterator))

    graft.sync.AlterTable.run(spark, table,
      graft.sync.AlterTable.RenameColumn("name", "full_name"))

    // graft's RENAME metaData vs the golden's v1 metaData: same action
    // keys, same configuration keys, same per-field metadata keys, and —
    // the rule that makes renames safe — the PHYSICAL names unchanged
    val goldenV1 = jsonLines(new java.io.File(
      "src/test/resources/golden/delta_mapped_people/_delta_log/" +
        "00000000000000000001.json").getAbsolutePath)
      .find(_.has("metaData")).get.get("metaData")
    val mine = jsonLines(s"$table/_delta_log/00000000000000000001.json")
      .find(_.has("metaData")).get.get("metaData")
    mine.properties().asScala.map(_.getKey).foreach { k =>
      assert(goldenV1.has(k), s"metaData field '$k' not in real shape")
    }
    assert(mine.get("configuration").has(DeltaColumnMapping.ModeKey))
    val mySchema = Jsons.mapper.readTree(
      mine.get("schemaString").asText)
    val renamed = mySchema.get("fields").elements().asScala
      .find(_.get("name").asText == "full_name")
    assert(renamed.isDefined, mySchema.toString)
    assert(renamed.get.get("metadata")
      .get(DeltaColumnMapping.PhysicalNameKey).asText == "col-bb22",
      "rename must keep the physical name")
    // read-back: logical rename serves the same physical data
    val df = new DeltaConversionSource(spark, table, "t").toDataFrame
    assert(df.columns.toSeq == Seq("id", "full_name"))
    assert(df.filter(org.apache.spark.sql.functions.col("id") === 1)
      .select("full_name").head().getString(0) == "ada")
  }

  test("partitioned Iceberg manifests carry spec field_summary bounds " +
    "in the manifest list") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val data = tmpDir("rev_ice_psum_data")
    (0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "p")
      .write.partitionBy("p").mode("overwrite").parquet(data)
    val t = tmpDir("rev_ice_psum")
    val src = new ParquetDirectorySource(spark, data, "t")
    val out = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, t)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    val v = IcebergMetadata.currentVersion(t).get
    val meta = IcebergMetadata.read(t, v)
    val mls = {
      val rd = new DataFileReader[GenericRecord](
        new java.io.File(graft.util.PathUtils.canonical(
          meta.snapshots.last.manifestList)),
        new GenericDatumReader[GenericRecord]())
      try rd.iterator().asScala.toSeq finally rd.close()
    }
    assert(mls.nonEmpty)
    val parts = mls.head.get("partitions")
    assert(parts != null, "manifest list must carry field_summary (507)")
    val summaries = parts.asInstanceOf[java.util.List[_]].asScala
      .map(_.asInstanceOf[GenericRecord])
    assert(summaries.size == 1) // one partition field: p
    val fs = summaries.head
    assert(fs.get("contains_null") == java.lang.Boolean.FALSE)
    def intOfBytes(v: AnyRef): Int = {
      val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    }
    assert(intOfBytes(fs.get("lower_bound")) == 0, fs.toString)
    assert(intOfBytes(fs.get("upper_bound")) == 3, fs.toString)
    // and graft reads its own partitioned tree back exactly
    assert(new graft.formats.iceberg.IcebergConversionSource(spark, t, "t")
      .toDataFrame.where(col("p") === lit(2)).count() == 10)
  }

  test("manifest r102 partition structs carry the partition spec's REAL " +
    "field ids in spec order") {
    // r14 ADVICE: r102 used alphabetically-sorted names with synthetic
    // 1000+i ids — an external field-id-based reader of a multi-column
    // spec could read swapped partition values. Spec order here is
    // (z, a): sorted-name order would flip it, so this test fails on
    // the synthetic scheme.
    import spark.implicits._
    val data = tmpDir("rev_ice_pids_data")
    (0 until 40).map(i => (i.toLong, i % 4, 2000 + i % 3))
      .toDF("id", "z", "a")
      .write.partitionBy("z", "a").mode("overwrite").parquet(data)
    val t = tmpDir("rev_ice_pids")
    val src = new ParquetDirectorySource(spark, data, "t")
    val out = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, t)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    val v = IcebergMetadata.currentVersion(t).get
    val meta = IcebergMetadata.read(t, v)
    val specIds = IcebergMetadata.specFieldIds(
      meta.schema, meta.partitionSpec, meta.otherSpecs)
    assert(specIds.map(_._1) == Seq("z", "a"), specIds.toString)
    assert(specIds.map(_._2) == Seq(1000, 1001), specIds.toString)

    val mls = {
      val rd = new DataFileReader[GenericRecord](
        new java.io.File(graft.util.PathUtils.canonical(
          meta.snapshots.last.manifestList)),
        new GenericDatumReader[GenericRecord]())
      try rd.iterator().asScala.toSeq finally rd.close()
    }
    assert(mls.nonEmpty)
    val manifest = new DataFileReader[GenericRecord](
      new java.io.File(graft.util.PathUtils.canonical(
        mls.head.get("manifest_path").toString)),
      new GenericDatumReader[GenericRecord]())
    val msch = try manifest.getSchema finally manifest.close()
    def unwrap(s: org.apache.avro.Schema): org.apache.avro.Schema =
      if (s.getType == org.apache.avro.Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType !=
          org.apache.avro.Schema.Type.NULL).get
      else s
    val dfSchema = unwrap(msch.getField("data_file").schema())
    val r102 = unwrap(dfSchema.getField("partition").schema())
    val got = r102.getFields.asScala.map(f => f.name() ->
      f.getObjectProp("field-id").asInstanceOf[Number].intValue()).toSeq
    assert(got == specIds,
      s"r102 must mirror the partition spec: r102=$got spec=$specIds")
    // the engine-extension field lives far outside both the reserved
    // manifest range and the partition-id growth path
    val lm = dfSchema.getField("last_modified_ms")
    assert(lm.getObjectProp("field-id")
      .asInstanceOf[Number].intValue() == 1000000000, lm.toString)
    // and the partitioned tree still reads back exactly
    assert(new graft.formats.iceberg.IcebergConversionSource(spark, t, "t")
      .toDataFrame.where("z = 2 AND a = 2001").count() > 0)
  }

  test("graft-written Iceberg metadata tree conforms to the v2 spec shape") {
    val goldenDir = golden("delta_dimGeography")   // data donor
    val table = syncInPlace(goldenDir, DeltaDataFile, "ice_dimGeography",
      new IcebergConversionTarget(spark, _))

    val v = IcebergMetadata.currentVersion(table).get
    val n = Jsons.mapper.readTree(Files.readAllBytes(
      Paths.get(IcebergMetadata.metadataFile(table, v))))
    for (k <- Seq("format-version", "table-uuid", "location",
        "last-sequence-number", "last-updated-ms", "last-column-id",
        "current-schema-id", "schemas", "default-spec-id", "partition-specs",
        "last-partition-id", "properties", "current-snapshot-id",
        "snapshots"))
      assert(n.has(k), k)
    assert(n.get("format-version").asInt == 2)

    val schema0 = n.get("schemas").get(0)
    assert(schema0.get("type").asText == "struct")
    assert(schema0.has("schema-id"))
    val fields = schema0.get("fields").elements().asScala.toSeq
    assert(fields.nonEmpty)
    fields.foreach { f =>
      for (k <- Seq("id", "name", "required", "type")) assert(f.has(k), k)
    }
    assert(n.get("last-column-id").asInt >=
      fields.map(_.get("id").asInt).max)

    // name mapping lets real engines read the id-less parquet: every
    // schema field resolves to its id by name
    val mapped = Jsons.mapper.readTree(n.get("properties")
      .get("schema.name-mapping.default").asText)
      .elements().asScala.map(e =>
        e.get("names").get(0).asText -> e.get("field-id").asInt).toMap
    fields.foreach { f =>
      assert(mapped.get(f.get("name").asText)
        .contains(f.get("id").asInt), f.get("name").asText)
    }

    val snap = n.get("snapshots").get(0)
    for (k <- Seq("snapshot-id", "sequence-number", "timestamp-ms",
        "manifest-list", "summary"))
      assert(snap.has(k), k)
    assert(snap.get("summary").get("operation").asText == "append")
    assert(n.get("current-snapshot-id").asLong ==
      snap.get("snapshot-id").asLong)

    // manifest list, read with PLAIN generic Avro — independent of graft's
    // own reader — must carry the spec's manifest_file fields
    def avroRecords(path: String): Seq[GenericRecord] = {
      val rd = new DataFileReader[GenericRecord](
        new java.io.File(graft.util.PathUtils.canonical(path)),
        new GenericDatumReader[GenericRecord]())
      try rd.iterator().asScala.toSeq finally rd.close()
    }
    val mls = avroRecords(snap.get("manifest-list").asText)
    assert(mls.nonEmpty)
    val ml = mls.head
    for (k <- Seq("manifest_path", "manifest_length", "partition_spec_id",
        "content", "sequence_number", "min_sequence_number",
        "added_snapshot_id", "added_data_files_count",
        "existing_data_files_count", "deleted_data_files_count", "added_rows_count", "existing_rows_count",
        "deleted_rows_count"))
      assert(ml.getSchema.getField(k) != null, k)
    assert(ml.get("content").asInstanceOf[Int] == 0)        // data manifest
    assert(ml.get("added_data_files_count").asInstanceOf[Int] == 1)
    assert(ml.get("added_rows_count").asInstanceOf[Long] == 674L)
    val manifestPath = graft.util.PathUtils.canonical(
      ml.get("manifest_path").toString)
    assert(ml.get("manifest_length").asInstanceOf[Long] ==
      Files.size(Paths.get(manifestPath)))
    assert(ml.get("added_snapshot_id").asInstanceOf[Long] ==
      snap.get("snapshot-id").asLong)

    // manifest entries: added status, real file, exact counts, bounds
    val entries = avroRecords(manifestPath)
    assert(entries.size == 1)
    val e = entries.head
    assert(e.get("status").asInstanceOf[Int] == 1)           // ADDED
    assert(e.get("snapshot_id").asInstanceOf[Long] ==
      snap.get("snapshot-id").asLong)
    val df = e.get("data_file").asInstanceOf[GenericRecord]
    val filePath = graft.util.PathUtils.canonical(
      df.get("file_path").toString)
    assert(Files.exists(Paths.get(filePath)), filePath)
    assert(df.get("file_format").toString == "PARQUET")
    assert(df.get("record_count").asInstanceOf[Long] == 674L)
    assert(df.get("file_size_in_bytes").asInstanceOf[Long] ==
      Files.size(Paths.get(filePath)))
    // bounds in the spec's k_v-array encoding (since r12 the writer
    // emits exactly what real Iceberg does — Avro map keys must be
    // strings, so the stats ride int-keyed key_value record arrays)
    val lower = df.get("lower_bounds").asInstanceOf[java.util.List[_]]
    val upper = df.get("upper_bounds").asInstanceOf[java.util.List[_]]
    assert(!lower.isEmpty && !upper.isEmpty)
    val kv0 = lower.get(0).asInstanceOf[GenericRecord]
    assert(kv0.get("key").isInstanceOf[Integer], kv0.toString)
    // the typed partition struct (empty here — unpartitioned)
    assert(df.get("partition").isInstanceOf[GenericRecord])

    // and the round trip stays intact: graft reads its own tree back
    val back = new graft.formats.iceberg.IcebergConversionSource(
      spark, table, "ice_dimGeography")
    assert(back.toDataFrame.count() == 674L)
  }

  test("graft's evolved-table metadata matches the real-writer evolution " +
    "conventions key-for-key") {
    import graft.model._
    import org.apache.spark.sql.functions.lit
    // build an evolved table exactly as syncs produce one: partition by
    // lang, evolve to source, then widen the schema — and diff its
    // metadata JSON against the independently-authored evolved fixture's
    // CONVENTIONS (array ordering, id assignment), not its values
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val table = tmpDir("rev_evo")

    def fe(df: org.apache.spark.sql.DataFrame, key: String,
        v: String): FileEntry = {
      val tmp = tmpDir("rev_evo_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(table, "data", f.getName)
      Files.createDirectories(dst.getParent)
      Files.move(f.toPath, dst)
      FileEntry(dst.toString, Files.size(dst), df.count(), "parquet",
        Seq(PartitionMember(key, v)), Nil, 1L)
    }
    def syncWith(files: Seq[FileEntry],
        schema: org.apache.spark.sql.types.StructType, key: String,
        commit: String): Unit = {
      import spark.implicits._
      val td = TableDescriptor("docs", TableFormats.Parquet, table, schema,
        Seq(PartitionFieldSpec(key, Transform.Value)),
        Layout.HivePartitioned, 1L)
      val out = TableFormatSync.syncSnapshot(
        Seq(new IcebergConversionTarget(spark, table)),
        TableSnapshot(td, spark.createDataset(files), commit), "PARQUET")
      assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    }

    val a = fe(docs.limit(20), "lang", "en")
    syncWith(Seq(a), docs.schema, "lang", "c1")
    val b = fe(docs.limit(10), "source", "web")
    syncWith(Seq(a, b), docs.schema, "source", "c2")
    val wider = org.apache.spark.sql.types.StructType(docs.schema.fields :+
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true))
    val c = fe(docs.limit(5).withColumn("score", lit(0.5)), "source", "api")
    syncWith(Seq(a, b, c), wider, "source", "c3")

    val mine = Jsons.mapper.readTree(Files.readAllBytes(Paths.get(
      IcebergMetadata.metadataFile(table,
        IcebergMetadata.currentVersion(table).get))))
    val real = Jsons.mapper.readTree(Files.readAllBytes(Paths.get(
      golden("iceberg_trades_evolved"), "metadata", "v2.metadata.json")))

    // the same conventions must hold in BOTH trees: historical entries
    // FIRST with the current appended LAST; partition field-ids unique
    // across specs starting at 1000; last-partition-id = max over all
    for ((n, who) <- Seq((mine, "graft"), (real, "fixture"))) {
      val specs = n.get("partition-specs").elements().asScala.toSeq
      assert(specs.map(_.get("spec-id").asInt) == Seq(0, 1),
        s"$who spec order: ${n.get("partition-specs")}")
      assert(n.get("default-spec-id").asInt == 1, who)
      val pids = specs.flatMap(_.get("fields").elements().asScala
        .map(_.get("field-id").asInt))
      assert(pids == Seq(1000, 1001), s"$who partition field ids $pids")
      assert(n.get("last-partition-id").asInt == 1001, who)
      val schemas = n.get("schemas").elements().asScala.toSeq
      assert(schemas.map(_.get("schema-id").asInt) == Seq(0, 1),
        s"$who schema order")
      assert(n.get("current-schema-id").asInt == 1, who)
      // every spec's source-id resolves in the CURRENT schema
      val curFields = schemas.last.get("fields").elements().asScala
        .map(_.get("id").asInt).toSet
      specs.foreach(_.get("fields").elements().asScala.foreach(f =>
        assert(curFields.contains(f.get("source-id").asInt),
          s"$who dangling source-id ${f.get("source-id")}")))
    }

    // manifest-list field 502: both trees reference BOTH specs, read
    // with plain generic Avro (independent of graft's reader)
    def listSpecIds(n: JsonNode, base: String): Set[Int] = {
      val ml = n.get("snapshots").elements().asScala.toSeq
        .maxBy(_.get("sequence-number").asLong).get("manifest-list").asText
      val p = if (ml.startsWith("file:")) ml.stripPrefix("file:")
        else if (ml.startsWith("/")) ml else s"$base/$ml"
      val rd = new DataFileReader[GenericRecord](new java.io.File(p),
        new GenericDatumReader[GenericRecord]())
      try {
        val out = Set.newBuilder[Int]
        while (rd.hasNext) out +=
          rd.next().get("partition_spec_id").asInstanceOf[Int]
        out.result()
      } finally rd.close()
    }
    assert(listSpecIds(mine, table) == Set(0, 1), "graft 502 values")
    assert(listSpecIds(real, golden("iceberg_trades_evolved")) == Set(0, 1),
      "fixture 502 values")
  }

  test("graft's deletion-vector blob frame is BIT-IDENTICAL to the " +
    "independent python fixture's") {
    // the strongest conformance statement two offline implementations
    // can make: same positions → same bytes. The fixture's blob (19
    // positions, array container, explicit-key 64-bit portable wrapper,
    // BE frame + CRC-32) was authored by tools/make_golden_iceberg_v3.py
    // with its own roaring serializer; graft re-derives the frame from
    // the raw positions through DeletionVectors.serializeBitmap + the
    // Puffin frame writer. Any divergence in container choice, cookie,
    // offset headers, key encoding, endianness or checksum fails here.
    import graft.formats.iceberg.{IcebergDeletes, IcebergMetadata, Puffin}
    val dir = new java.io.File(
      "src/test/resources/golden/iceberg_v3_dv").getAbsolutePath
    val m = IcebergMetadata.read(dir, 1)
    val ref = IcebergDeletes.liveDeleteRefs(m, m.headSequence).head
    val fixtureBytes = {
      val all = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(ref.path))
      java.util.Arrays.copyOfRange(all, ref.contentOffset.get.toInt,
        (ref.contentOffset.get + ref.contentSizeBytes.get).toInt)
    }
    // the fixture's deleted positions: ≡2 (mod 5) over 90 rows plus the
    // last row (the generator's spec)
    val positions = ((0 until 90).filter(_ % 5 == 2).map(_.toLong) :+ 89L)
      .distinct.sorted
    assert(positions.size == ref.recordCount, s"${positions.size}")
    val mine = {
      val p = tmpDir("rev_dv") + "/mine.puffin"
      val blobs = Puffin.writeDeletionVectors(p, 1L, 1L,
        Seq(Puffin.Dv("x", positions)))
      val all = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p))
      java.util.Arrays.copyOfRange(all, blobs.head.offset.toInt,
        (blobs.head.offset + blobs.head.length).toInt)
    }
    assert(mine.length == fixtureBytes.length,
      s"frame lengths differ: graft ${mine.length} vs fixture " +
        s"${fixtureBytes.length}")
    assert(java.util.Arrays.equals(mine, fixtureBytes),
      "DV blob frames differ byte-for-byte")
  }

  test("graft-written row-tracking actions match the independently-" +
    "authored fixture shape key-for-key") {
    // two transcriptions of PROTOCOL.md §Row Tracking — graft's writers
    // and tools/make_golden_delta_rowtracking.py — diffed at the action
    // level: add keys, domainMetadata shape, configuration properties.
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val fixLog = new java.io.File(
      "src/test/resources/golden/delta_rowtracking/_delta_log")
    def addKeys(line: String): Option[Set[String]] =
      Option(Jsons.mapper.readTree(line).get("add"))
        .map(_.properties().asScala.map(_.getKey).toSet)
    def domainNode(line: String) =
      Option(Jsons.mapper.readTree(line).get("domainMetadata"))
    val fixLines = fixLog.listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    val fixAddKeys = fixLines.flatMap(addKeys)
    val fixDomains = fixLines.flatMap(l => domainNode(l))
    assert(fixAddKeys.nonEmpty && fixDomains.nonEmpty)

    // a graft table through the same motions: enable + update
    val t = tmpDir("rev_rowtracking")
    graft.formats.delta.DeltaWrite.write(spark, t,
      (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v").repartition(2),
      overwrite = false)
    graft.formats.delta.DeltaRowTracking.enable(spark, t)
    graft.formats.delta.DeltaDeletes.updateWhere(spark, t,
      col("k") === 3L, Map("v" -> lit("u")))
    val g = new java.io.File(t, "_delta_log")
    val gLines = g.listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)

    // every graft add in a row-tracking commit carries EXACTLY the
    // fixture's row-tracking keys (baseRowId, defaultRowCommitVersion
    // alongside the standard add fields; DV re-adds also carry
    // deletionVector — a fixture-allowed superset key)
    val gAddKeys = gLines.drop(0).flatMap(addKeys)
    val rtAdds = gAddKeys.filter(_.contains("baseRowId"))
    assert(rtAdds.nonEmpty, "graft wrote no row-tracking adds")
    val fixtureKeySet = fixAddKeys.reduce(_ ++ _)
    for (ks <- rtAdds)
      assert((ks - "deletionVector") subsetOf fixtureKeySet,
        s"graft add keys $ks not in fixture shape $fixtureKeySet")
    assert(rtAdds.forall(ks => ks.contains("defaultRowCommitVersion")))

    // domainMetadata: same three keys, same domain, configuration is a
    // JSON STRING carrying rowIdHighWaterMark — byte-shape parity
    val gDomains = gLines.flatMap(domainNode)
    assert(gDomains.nonEmpty)
    val fixShape = fixDomains.head.properties().asScala.map(_.getKey).toSet
    for (d <- gDomains) {
      assert(d.properties().asScala.map(_.getKey).toSet == fixShape,
        d.toString)
      assert(d.get("domain").asText == "delta.rowTracking")
      assert(Jsons.mapper.readTree(d.get("configuration").asText)
        .has("rowIdHighWaterMark"), d.toString)
    }

    // configuration properties: graft plants the same three keys the
    // fixture's metaData carries
    val fixCfg = fixLines.flatMap(l =>
      Option(Jsons.mapper.readTree(l).get("metaData")))
      .head.get("configuration").properties().asScala.map(_.getKey).toSet
    val gCfg = gLines.flatMap(l =>
      Option(Jsons.mapper.readTree(l).get("metaData")))
      .last.get("configuration").properties().asScala.map(_.getKey).toSet
    assert(fixCfg.filter(_.startsWith("delta.")).subsetOf(gCfg),
      s"fixture $fixCfg vs graft $gCfg")

    // and the graft table's lineage read serves what it wrote: update
    // kept the row's id
    val lin = spark.read.format("graft")
      .option("withRowLineage", "true").load(t)
      .select(col("k"), col("_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lin.size == 20 && lin.values.toSeq.distinct.size == 20)
    assert(lin(3L) < 20L, "updated row must keep a backfilled id")
  }
}
