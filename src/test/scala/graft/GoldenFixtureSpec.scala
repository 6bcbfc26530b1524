package graft

import graft.formats.delta.{DeltaConversionSource, DeltaConversionTarget, DeltaRead}
import graft.formats.hudi.{HudiConversionSource, HudiTimeline}

/** Byte-level interop against metadata authored by the REAL format writers
  * — not this library's own targets — so spec conformance stops being
  * self-referential. Fixtures under `src/test/resources/golden/` are the
  * public demo tables of apache/incubator-xtable (`demo/data/db/`):
  *   - `delta_dimGeography`: written by real delta-spark (protocol 1/2
  *     JSON log, inline stats, no checkpoint)
  *   - `hudi_dimCustomer`: written by real Hudi 0.14 (COW, real
  *     `<fileId>_<token>_<instant>` base-file naming, HoodieCommitMetadata
  *     JSON whose `extraMetadata.schema` is an AVRO schema, HFile metadata
  *     table this reader must ignore, `.requested`/`.inflight` instants)
  */
class GoldenFixtureSpec extends SparkSuite {

  private def golden(name: String): String =
    getClass.getResource(s"/golden/$name").getPath

  test("reads a real delta-spark table's log byte-for-byte") {
    val dir = golden("delta_dimGeography")
    val src = new DeltaConversionSource(spark, dir, "dimGeography")
    val snap = src.currentSnapshot()
    val files = snap.files.collect()
    assert(files.length == 1)
    assert(files.head.path.endsWith(
      "part-00000-6ccb71bc-9cc1-4226-a7b5-f752edbedee6-c000.snappy.parquet"))
    assert(files.head.recordCount == 674)        // from the add's stats JSON
    assert(files.head.fileSizeBytes == 12822)
    val gk = files.head.columnStats.find(_.field == "GeographyKey")
    assert(gk.exists(s => s.min.contains("1") && s.max.contains("952")))
    assert(gk.exists(_.numNulls == 0))
    assert(snap.table.schema.fieldNames.toSeq == Seq("GeographyKey",
      "GeographyType", "ContinentName", "CityName", "StateProvinceName",
      "RegionCountryName"))
    assert(src.toDataFrame.count() == 674)
  }

  test("reads a real hudi-written table: timeline, naming, avro schema") {
    val dir = golden("hudi_dimCustomer")
    // only the COMPLETED instant — .requested/.inflight are not commits
    assert(HudiTimeline.listInstants(dir) == Seq("20231105172136406"))
    assert(HudiTimeline.tableType(dir) == "COPY_ON_WRITE")
    assert(HudiTimeline.tableName(dir).contains("hudi_dimCustomer"))

    val src = new HudiConversionSource(spark, dir, "hudi_dimCustomer")
    val table = src.currentTable()
    // schema parsed from the real writer's AVRO under extraMetadata.schema
    assert(table.schema.fieldNames.contains("CustomerKey"))
    assert(table.schema.fieldNames.contains("GeographyKey"))

    val snap = src.currentSnapshot()
    val files = snap.files.collect()
    assert(files.length == 1)
    assert(files.head.path.endsWith(
      "b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet"))
    assert(files.head.recordCount == 5000)
    // stats came from the footer fallback (the real HFile metadata table
    // is unreadable here and must be silently skipped, not crash)
    assert(files.head.columnStats.nonEmpty)
    assert(src.toDataFrame.count() == 5000)
  }

  test("reads an independently-authored COLUMN-MAPPED delta table with " +
      "a RENAME in its history") {
    // tools/make_golden_delta_mapped.py: protocol (2,5), columnMapping
    // mode=name, physical col-<uuid> names in the parquet AND in the
    // stats JSON; v1 renames `name` → `full_name` as pure metaData; v2
    // adds a file after the rename. Logical names must be served, with
    // stats resolved physical → logical.
    val dir = new java.io.File(
      "src/test/resources/golden/delta_mapped_people").getAbsolutePath
    val src = new DeltaConversionSource(spark, dir, "people")
    val snap = src.currentSnapshot()
    assert(snap.table.schema.fieldNames.toSeq ==
      Seq("id", "full_name", "city"))
    val files = snap.files.collect()
    assert(files.length == 2, files.map(_.path).toSeq)
    assert(files.map(_.recordCount).sum == 5)
    // stats keyed by physical name in the log must surface logical
    val idStats = files.flatMap(_.columnStats).filter(_.field == "id")
    assert(idStats.length == 2, files.flatMap(_.columnStats).toSeq)
    assert(idStats.exists(s => s.min.contains("1") && s.max.contains("3")))
    assert(idStats.exists(s => s.min.contains("4") && s.max.contains("5")))

    val df = src.toDataFrame
    assert(df.columns.toSeq == Seq("id", "full_name", "city"))
    assert(df.count() == 5)
    import org.apache.spark.sql.functions.{col, sum}
    assert(df.agg(sum("id")).head().getLong(0) == 15L)
    assert(df.filter(col("id") === 1).select("full_name")
      .head().getString(0) == "ada")
    assert(df.filter(col("id") === 5).select("full_name")
      .head().getString(0) == "eli")

    // time travel BEFORE the rename serves the old logical name over the
    // same physical data
    val v0 = src.snapshotAt(0L)
    assert(v0.table.schema.fieldNames.toSeq == Seq("id", "name", "city"))
    val df0 = DeltaRead.toDataFrame(spark, v0)
    assert(df0.count() == 3)
    assert(df0.filter(col("id") === 2).select("name")
      .head().getString(0) == "bob")
  }

  test("reads an independently-authored EVOLVED paimon table through " +
      "its schema chain") {
    // tools/make_golden_paimon_evolved.py: schema-0 → schema-1 (ADD
    // COLUMN channel), snapshot-1 under schema 0, snapshot-2 under
    // schema 1 with files from BOTH schemas live. The snapshot's own
    // schemaId decides the serving schema; pre-evolution files read the
    // added column as NULL.
    val dir = new java.io.File(
      "src/test/resources/golden/paimon_orders_evolved").getAbsolutePath
    val src = new graft.formats.paimon.PaimonConversionSource(
      spark, dir, "orders_evolved")
    val snap = src.currentSnapshot()
    assert(snap.table.schema.fieldNames.toSeq ==
      Seq("order_id", "region", "amount", "channel"))
    val files = snap.files.collect()
    assert(files.length == 2, files.map(_.path).toSeq)
    assert(files.map(_.recordCount).sum == 80)

    val df = src.toDataFrame
    assert(df.count() == 80)
    import org.apache.spark.sql.functions.{col, sum}
    assert(df.agg(sum("order_id")).head().getLong(0) == 4740L)
    // the 50 pre-evolution rows surface NULL channel; the 30 new rows
    // carry real values
    assert(df.filter(col("channel").isNull).count() == 50)
    assert(df.filter(col("channel") === "web").count() == 15)

    // time travel to snapshot-1: served under schema-0, WITHOUT channel
    val s1 = src.snapshotAt(1L)
    assert(s1.table.schema.fieldNames.toSeq ==
      Seq("order_id", "region", "amount"))
    assert(s1.files.collect().map(_.recordCount).sum == 50)
  }

  test("reads an independently-authored Hudi 1.x timeline-layout table") {
    // tools/make_golden_hudi_v1.py: table version 8, active timeline under
    // .hoodie/timeline/, completed instants named
    // <requestTime>_<completionTime>.<action>, commit metadata as AVRO
    // object containers (HoodieCommitMetadata / the replace variant), base
    // files with real <fileId>_<token>_<instant> names and _hoodie_* meta
    // columns. Three instants; the replacecommit clusters fileA+fileC into
    // fileD, so the head live set is fileB + fileD = 125 rows.
    val dir = new java.io.File(
      "src/test/resources/golden/hudi_v1_trips").getAbsolutePath
    assert(HudiTimeline.tableVersion(dir) == 8)
    assert(HudiTimeline.isV1Layout(dir))
    // completed only — .requested/.inflight are not commits; request
    // times (not completion times) are the instant ids
    assert(HudiTimeline.listInstants(dir) == Seq(
      "20240301120000001", "20240301130000001", "20240301140000001",
      "20240301150000001"))
    assert(HudiTimeline.tableType(dir) == "MERGE_ON_READ")

    // avro-container commit metadata decodes generically by field name
    val c1 = HudiTimeline.readCommit(dir, "20240301120000001")
    assert(c1.action == "commit")
    assert(c1.partitionToWriteStats("").map(_.numWrites).sum == 100)
    assert(c1.extraMetadata.contains("schema"))
    val c3 = HudiTimeline.readCommit(dir, "20240301140000001")
    assert(c3.action == "replacecommit")
    assert(c3.partitionToReplaceFileIds("").toSet == Set(
      "aaaa1111-0000-4000-8000-000000000001-0",
      "cccc3333-0000-4000-8000-000000000003-0"))

    val src = new HudiConversionSource(spark, dir, "hudi_v1_trips")
    val table = src.currentTable()
    assert(Seq("trip_id", "city", "fare").forall(
      table.schema.fieldNames.contains), table.schema.simpleString)
    val files = src.currentSnapshot().files.collect()
    assert(files.length == 2, files.map(_.path).mkString(","))
    assert(files.map(_.recordCount).sum == 125)
    assert(files.exists(_.path.contains("bbbb2222")) &&
      files.exists(_.path.contains("dddd4444")), files.map(_.path).toSeq)
    val df = src.toDataFrame
    assert(df.count() == 125)
    import org.apache.spark.sql.functions.{col, sum}
    assert(df.agg(sum("trip_id")).head().getLong(0) == 7875L)
    // the 1.x deltacommit's log file must NOT leak into the RO view:
    // trips 61-63 serve their base values
    assert(df.filter(col("trip_id") === 61).head().getAs[String]("city")
      != "muc")

    // c4 is a MOR deltacommit under the 1.x layout: a HoodieLogFormat v1
    // log file on fileB's group. The REAL-TIME (snapshot) view merges it
    val c4 = HudiTimeline.readCommit(dir, "20240301150000001")
    assert(c4.action == "deltacommit", c4.action)
    assert(c4.partitionToWriteStats("").forall(s =>
      HudiTimeline.isLogFile(s.path)), c4.partitionToWriteStats.toString)
    val rt = new HudiConversionSource(spark, dir, "hudi_v1_trips",
      "snapshot")
    val merged = rt.toDataFrame
    assert(merged.count() == 125)
    val updated = merged.filter(col("trip_id").isin(61L, 62L, 63L))
      .select("city", "fare").collect()
    assert(updated.length == 3 && updated.forall(r =>
      r.getString(0) == "muc" && r.getDouble(1) == 99.5),
      updated.mkString(","))
    assert(merged.agg(sum("trip_id")).head().getLong(0) == 7875L)
    // file-level surfaces refuse the real-time snapshot while logs are
    // pending — same guard as 0.x MOR
    intercept[UnsupportedOperationException](rt.currentSnapshot())

    // c5/c6 (r15): a FAILED deltacommit whose partial base file landed
    // on disk, retracted by a 1.x-named completed ROLLBACK instant
    // (HoodieRollbackMetadata avro container, whose failedDeleteFiles
    // still lists the orphan). The rollback is NOT a data commit —
    // listInstants (asserted above) excludes it — and the orphan file
    // must never serve: reads are driven by COMPLETED commit metadata,
    // not the directory listing.
    assert(HudiTimeline.rollbackTargets(dir) == Seq("20240301160000001"))
    assert(new java.io.File(dir).listFiles().exists(
      _.getName.contains("eeee5555")), "fixture must hold the orphan")
    assert(!df.columns.isEmpty && df.filter(
      col("trip_id") >= 900).count() == 0,
      "rolled-back partial file leaked into the read")
    assert(merged.filter(col("trip_id") >= 900).count() == 0)
    // incremental sync resuming at/after the head instant stays SAFE:
    // the rollback's target (a failed later instant) never reached any
    // backlog; the clean/rollback horizons agree
    assert(src.isIncrementalSyncSafeFrom("20240301150000001"))

    // graft's write dialect is 0.x (same pin as the reference): authoring
    // timeline files into a 1.x table must refuse, not fork the timeline
    intercept[UnsupportedOperationException] {
      HudiTimeline.writeCommit(HudiTimeline.CommitMeta(
        "20240301160000001", "commit", Map.empty, Map.empty, Map.empty), dir)
    }
  }

  test("reads an independently-authored spec-exact Iceberg v2 table") {
    // src/test/resources directly (not the classpath copy): the fixture's
    // file: URIs are baked to the source-tree location by the generator
    // (tools/make_golden_iceberg.py — a python-stdlib avro/JSON writer
    // transcribed from the PUBLIC Iceberg spec, sharing zero code with
    // this engine). Real-writer shapes the engine's own writer does NOT
    // produce: file: URIs, k_v-record arrays for stat maps, typed empty
    // partition struct, nullable unions, avro-compat counter names.
    val dir = new java.io.File(
      "src/test/resources/golden/iceberg_trades").getAbsolutePath
    val src = new graft.formats.iceberg.IcebergConversionSource(
      spark, dir, "trades")
    val snap = src.currentSnapshot()
    assert(snap.table.schema.fieldNames.toSeq ==
      Seq("trade_id", "symbol", "qty", "price"))
    val files = snap.files.collect()
    assert(files.length == 1)
    assert(files.head.path.endsWith(
      "00000-0-11111111-2222-3333-4444-555555555555-00001.parquet"))
    assert(!files.head.path.startsWith("file:"), files.head.path)
    assert(files.head.recordCount == 120)
    // bounds decoded from the spec's little-endian single-value binary,
    // keyed by field id, delivered through the k_v-array dialect
    val tid = files.head.columnStats.find(_.field == "trade_id").get
    assert(tid.min.contains("1") && tid.max.contains("120"), tid.toString)
    val px = files.head.columnStats.find(_.field == "price").get
    assert(px.min.contains("10.0"), px.toString)
    val sym = files.head.columnStats.find(_.field == "symbol").get
    assert(sym.min.contains("AAA") && sym.max.contains("DDD"), sym.toString)

    val df = src.toDataFrame
    assert(df.count() == 120)
    import org.apache.spark.sql.functions.sum
    assert(df.agg(sum("trade_id")).head().getLong(0) == 7260L)
    assert(df.agg(sum("qty")).head().getLong(0) == 26100L)
  }

  test("independently-authored Iceberg table syncs to delta " +
    "row-identically") {
    val dir = new java.io.File(
      "src/test/resources/golden/iceberg_trades").getAbsolutePath
    val src = new graft.formats.iceberg.IcebergConversionSource(
      spark, dir, "trades")
    val deltaDir = tmpDir("golden_ice_delta")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, deltaDir)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val back = new DeltaConversionSource(spark, deltaDir, "trades")
      .toDataFrame
    assert(back.count() == 120)
    import org.apache.spark.sql.functions.sum
    assert(back.agg(sum("trade_id")).head().getLong(0) == 7260L)
  }

  test("reads an independently-authored real-layout Paimon table") {
    // tools/make_golden_paimon.py: the JSON planes are REAL Paimon's
    // (schema-0 Flink-SQL types + primaryKeys/options extras, snapshot-1
    // with version/commitUser/commitIdentifier/logOffsets/record-count
    // extras and manifest lists as BARE NAMES resolved under manifest/,
    // LATEST+EARLIEST hints); the avro manifests are the engine's
    // documented dialect independently reimplemented in python — a
    // cross-implementation check of both planes. All paths are relative,
    // so the fixture reads from the classpath copy.
    val dir = golden("paimon_orders")
    assert(graft.formats.paimon.PaimonFormat.latestSnapshotId(dir)
      .contains(1L))
    val snap0 = graft.formats.paimon.PaimonFormat.readSnapshot(dir, 1L)
    assert(snap0.commitKind == "APPEND")
    assert(!snap0.baseManifestList.contains("/"),
      "fixture must carry real Paimon's bare manifest-list names")
    val src = new graft.formats.paimon.PaimonConversionSource(
      spark, dir, "orders")
    val snap = src.currentSnapshot()
    assert(snap.table.schema.fieldNames.toSeq ==
      Seq("order_id", "region", "amount"))
    assert(!snap.table.schema("order_id").nullable, "BIGINT NOT NULL")
    val files = snap.files.collect()
    assert(files.length == 1)
    assert(files.head.path.endsWith(
      "bucket-0/data-77777777-8888-9999-aaaa-bbbbbbbbbbbb-0.parquet"))
    assert(files.head.recordCount == 90)
    val oid = files.head.columnStats.find(_.field == "order_id").get
    assert(oid.min.contains("1") && oid.max.contains("90"), oid.toString)

    val df = src.toDataFrame
    assert(df.count() == 90)
    import org.apache.spark.sql.functions.sum
    assert(df.agg(sum("order_id")).head().getLong(0) == 4095L)
    assert(math.abs(df.agg(sum("amount")).head().getDouble(0) - 4363.5)
      < 1e-9)
  }

  test("independently-authored Paimon table syncs to delta " +
    "row-identically") {
    val dir = golden("paimon_orders")
    val src = new graft.formats.paimon.PaimonConversionSource(
      spark, dir, "orders")
    val deltaDir = tmpDir("golden_pai_delta")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, deltaDir)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val back = new DeltaConversionSource(spark, deltaDir, "orders")
      .toDataFrame
    assert(back.count() == 90)
    import org.apache.spark.sql.functions.sum
    assert(back.agg(sum("order_id")).head().getLong(0) == 4095L)
  }

  test("real hudi table syncs to delta and reads row-identical") {
    val dir = golden("hudi_dimCustomer")
    val deltaDir = tmpDir("golden_hudi_delta")
    val src = new HudiConversionSource(spark, dir, "hudi_dimCustomer")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, deltaDir)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val back = new DeltaConversionSource(spark, deltaDir, "hudi_dimCustomer")
      .toDataFrame
    assert(back.count() == 5000)
    val direct = spark.read.parquet(
      s"$dir/b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet")
    assert(back.agg(org.apache.spark.sql.functions.sum("CustomerKey")).head.get(0) ==
      direct.agg(org.apache.spark.sql.functions.sum("CustomerKey")).head.get(0))
  }

  test("walks real Hudi-0.14-written HoodieLogFormat files byte-exact") {
    // the demo's metadata-table logs were written by REAL Hudi 0.14 —
    // the framing walker must parse their blocks (magic, sizes, version,
    // type ordinals, ordinal-keyed header maps) without byte slippage
    import graft.formats.hudi.HudiLogFiles
    val conf = graft.util.HadoopConfs.session(spark)
    // source-tree resources: sbt's resource copy drops dot-prefixed
    // files, and Hudi log files are dot-prefixed by design
    val mdir = "src/test/resources/golden/hudi_dimCustomer/" +
      ".hoodie/metadata/files"
    val logs = new java.io.File(mdir).listFiles()
      .filter(_.getName.contains(".log.")).map(_.getPath).sorted.toSeq
    assert(logs.size >= 2, s"expected metadata log fixtures in $mdir")
    val blocks = logs.map(p => p -> HudiLogFiles.walkBlocks(conf, p))
    // every file parses to at least one complete block
    blocks.foreach { case (p, bs) => assert(bs.nonEmpty, s"no blocks: $p") }
    val all = blocks.flatMap(_._2)
    // real Hudi wrote these: instants parse from ordinal-keyed headers
    assert(all.exists(_.instant == "00000000000000010"),
      all.map(_.instant).toString)
    // the fixture holds an HFILE data block (type 4) whose SCHEMA header
    // is the HoodieMetadataRecord avro schema, and a non-data block
    val hfile = all.find(_.blockType == HudiLogFiles.HFileDataBlock)
    assert(hfile.isDefined, all.map(_.blockType).toString)
    assert(hfile.get.headers(2).contains("HoodieMetadataRecord"))
    assert(all.exists(_.blockType != HudiLogFiles.HFileDataBlock))
    // readLogFile walks past non-avro types instead of erroring
    logs.foreach(p => HudiLogFiles.readLogFile(conf, p))
  }

  test("graft-written MOR log round-trips through the v1 framing") {
    // byte-level invariants a real Hudi reader depends on: magic at 0,
    // size field covering through the trailing reverse-pointer, version
    // 1, AVRO ordinal 3, reverse-pointer = block size minus the long
    import graft.formats.hudi.{HudiLogFiles, HudiTimeline}
    import org.apache.spark.sql.functions.col
    val conf = graft.util.HadoopConfs.session(spark)
    val dataDir = tmpDir("lfmt_data")
    spark.read.parquet(sf("sf0.001/region.parquet")).coalesce(1)
      .write.mode("overwrite").parquet(dataDir)
    val table = tmpDir("lfmt_mor")
    val src = new graft.sources.ParquetDirectorySource(spark, dataDir,
      "region")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.hudi.HudiConversionTarget(spark, table)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    HudiTimeline.setProperty(table, "hoodie.table.type", "MERGE_ON_READ")
    val upd = spark.read.parquet(dataDir)
      .where("r_regionkey = 0")
      .withColumn("r_name", org.apache.spark.sql.functions.lit("ZED"))
    assert(HudiLogFiles.upsert(spark, table, upd, Seq("r_regionkey")) == 1L)
    assert(HudiLogFiles.deleteWhere(spark, table,
      col("r_regionkey") === 4) == 1L)
    val logs = new java.io.File(table).listFiles()
      .filter(f => HudiTimeline.isLogFile(f.getName) &&
        !f.getName.endsWith(".crc")).map(_.getPath).toSeq
    assert(logs.size == 2, logs.toString)
    logs.foreach { p =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p))
      assert(new String(bytes.take(6),
        java.nio.charset.StandardCharsets.US_ASCII) == "#HUDI#")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val size = bb.getLong(6)
      assert(6 + 8 + size == bytes.length,
        s"size field $size vs file ${bytes.length}")
      assert(bb.getInt(14) == 1)                     // format version
      val typ = bb.getInt(18)
      assert(typ == 3 || typ == 1, s"type $typ")     // AVRO | DELETE
      val tail = bb.getLong(bytes.length - 8)
      assert(tail == bytes.length - 8, s"reverse pointer $tail")
    }
    // and the real-time merge serves the updated + tombstoned state
    val rt = new graft.formats.hudi.HudiConversionSource(spark, table,
      "region", "snapshot").toDataFrame
    assert(rt.count() == 4)
    assert(rt.where("r_regionkey = 0").select("r_name").head.getString(0)
      == "ZED")
  }

  test("reads an independently-authored EVOLVED Iceberg table (two " +
    "schemas, two specs, current LAST)") {
    // tools/make_golden_iceberg_evolved.py: real-writer evolution layout
    // — historical schema/spec FIRST in the arrays with the current ones
    // appended, manifests typed by their OWN spec (r102 symbol vs venue),
    // partition field-ids unique across specs (1000, 1001). A reader
    // that takes array element [0] serves the pre-evolution schema.
    import org.apache.spark.sql.functions.{col, sum}
    val dir = new java.io.File(
      "src/test/resources/golden/iceberg_trades_evolved").getAbsolutePath
    val m = graft.formats.iceberg.IcebergMetadata.read(dir, 2)
    assert(m.currentSchemaId == 1 && m.defaultSpecId == 1)
    assert(m.schema.fieldNames.toSeq ==
      Seq("trade_id", "symbol", "qty", "price", "venue"))
    assert(m.partitionSpec.map(_.sourceField) == Seq("venue"))
    assert(m.otherSchemas.size == 1 && m.otherSpecs.size == 1)

    val src = new graft.formats.iceberg.IcebergConversionSource(
      spark, dir, "trades")
    // mixed specs: identity columns serve from DATA (Flat layout)
    assert(src.currentTable().layout == graft.model.Layout.Flat)
    val df = src.toDataFrame
    assert(df.count() == 80)
    assert(df.agg(sum("trade_id")).head().getLong(0) == 3240L)
    // the pre-evolution file serves null venue (column added later);
    // filters on either generation's partition column stay exact
    assert(df.filter(col("venue").isNull).count() == 40)
    assert(df.filter(col("venue") === "X").count() == 40)
    assert(df.filter(col("symbol") === "AAA").count() == 50)

    // a graft commit on this table must preserve the full history
    assert(graft.formats.iceberg.IcebergMetadata.write(
      graft.util.TempDirs.create("golden_evo_rt"), 1, m))
  }

  test("reads an independently-authored Iceberg FORMAT-VERSION 3 table " +
    "with a puffin deletion vector") {
    // tools/make_golden_iceberg_v3.py: v3 metadata (next-row-id,
    // first-row-id on snapshots), a content=1 delete manifest whose
    // entry is a PUFFIN deletion vector (fields 143-145) in the FULL
    // v3 data_file schema (first_row_id and every optional stat field
    // present — wider than the engine's own DV writer schema, proving
    // by-name resolution), a hand-rolled puffin file whose blob is the
    // spec's Delta-compatible frame over an independent python roaring
    // serializer. 90 rows, positions ≡2 (mod 5) and the last row
    // deleted → 71 served.
    import org.apache.spark.sql.functions.sum
    val dir = new java.io.File(
      "src/test/resources/golden/iceberg_v3_dv").getAbsolutePath
    val m = graft.formats.iceberg.IcebergMetadata.read(dir, 1)
    assert(m.formatVersion == 3 && m.nextRowId == 90L)
    val refs = graft.formats.iceberg.IcebergDeletes
      .liveDeleteRefs(m, m.headSequence)
    assert(refs.size == 1 && refs.head.isDeletionVector, refs.toString)
    assert(refs.head.recordCount == 19L)
    assert(refs.head.contentOffset.contains(4L), refs.head.toString)

    val src = new graft.formats.iceberg.IcebergConversionSource(
      spark, dir, "orders")
    val df = src.toDataFrame
    assert(df.count() == 71)
    assert(df.agg(sum("order_id")).head().getLong(0) == 3186L)
    assert(df.agg(sum("amount")).head().getLong(0) == 20966L)
    // v3 initial-default: `region` was added AFTER the data file was
    // written (no file carries the column), so every served row reads
    // the spec default — via Spark's existence-default scan fill, not a
    // null-coalesce that would also clobber stored nulls
    assert(df.columns.contains("region"), df.columns.mkString(","))
    val regions = df.select("region").distinct().collect().map(_.getString(0))
    assert(regions.toSeq == Seq("emea"), regions.mkString(","))
    // NON-SCALAR defaults: `audit` is a struct-typed added field whose
    // spec single-value is keyed by FIELD ID ({"5": "import", "6": 7}),
    // `fee` a decimal serialized as a JSON string with exact scale —
    // both served through the same existence fill
    val audits = df.select("audit").distinct().collect()
    assert(audits.length == 1, audits.mkString(","))
    val a = audits.head.getStruct(0)
    assert(a.getString(0) == "import" && a.getInt(1) == 7, a.toString)
    val fees = df.select("fee").distinct().collect()
      .map(_.getDecimal(0).toPlainString)
    assert(fees.toSeq == Seq("14.20"), fees.mkString(","))
    // time travel to the pre-DV snapshot serves all 90 rows
    assert(src.toDataFrameAt(1L).count() == 90)
    // position-delete FILES refuse on v3 per spec (the guard fires
    // before any byte lands, so the checked-in fixture stays pristine;
    // equality deletes, DV deletes, blind appends and lineage-preserving
    // rewrites are the supported v3 writes — see IcebergV3Spec)
    import spark.implicits._
    val e = intercept[UnsupportedOperationException] {
      graft.formats.iceberg.IcebergDeletes.appendPositionDeletes(spark, dir,
        Seq(("f.parquet", 0L)).toDF("file_path", "pos"))
    }
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
  }

  test("reads an independently-authored Delta table with on-disk AND " +
    "inline deletion vectors") {
    // tools/make_golden_delta_dv.py: protocol (3,7) with the
    // deletionVectors feature, a DV-rewrite commit (add+remove same
    // path), a `u`-storage DV file (version byte, BE-framed CRC'd
    // payload, z85 uuid in pathOrInlineDv) and an `i`-storage INLINE DV
    // (z85 of the payload itself) — both payloads in the portable
    // roaring layout from an independent python serializer. 100 rows,
    // 19 masked → 81 served.
    import org.apache.spark.sql.functions.sum
    val dir = new java.io.File(
      "src/test/resources/golden/delta_dv_people").getAbsolutePath
    val src = new graft.formats.delta.DeltaConversionSource(
      spark, dir, "people")
    val df = src.toDataFrame
    assert(df.count() == 81)
    assert(df.agg(sum("id")).head().getLong(0) == 4475L)
    assert(df.agg(sum("score")).head().getLong(0) == 3685L)
    // pre-delete time travel serves all 100 rows
    assert(graft.formats.delta.DeltaRead.toDataFrame(spark,
      src.snapshotAt(0L)).count() == 100)
  }

  test("reads an independently-authored Delta table with ROW TRACKING; " +
    "materialized ids beat position defaults") {
    // tools/make_golden_delta_rowtracking.py: protocol (1,7) with
    // writer-only [domainMetadata, rowTracking], adds carrying
    // baseRowId/defaultRowCommitVersion, the delta.rowTracking domain
    // high-water mark, and an OPTIMIZE rewrite whose replacement file
    // REORDERS rows and materializes their ids — position-derived ids
    // would swap every row of that file.
    import org.apache.spark.sql.functions.col
    val dir = new java.io.File(
      "src/test/resources/golden/delta_rowtracking").getAbsolutePath
    val src = new graft.formats.delta.DeltaConversionSource(
      spark, dir, "t")
    val df = src.toDataFrame
    assert(df.columns.toSeq == Seq("k", "v"),
      "materialized physical columns must stay out of the logical surface")
    assert(df.count() == 50)

    val lin = spark.read.format("graft")
      .option("withRowLineage", "true").load(dir)
      .select(col("k"), col("_row_id"), col("_row_commit_version"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(lin.size == 50)
    // the fixture is built so every row's id equals its key — rows 0..24
    // only via the MATERIALIZED column (their file is reordered), rows
    // 25..49 via baseRowId + position
    assert(lin.forall { case (k, (id, _)) => id == k },
      lin.toSeq.sortBy(_._1).take(30).mkString(","))
    // rewritten rows keep their ORIGINAL commit version (materialized 0,
    // not the rewrite's default 1)
    assert(lin.values.forall(_._2 == 0L),
      lin.toSeq.sortBy(_._1).take(30).mkString(","))

    val versions = graft.formats.delta.DeltaLog.listVersions(dir,
      graft.util.HadoopConfs.session(spark))
    assert(graft.formats.delta.DeltaRowTracking
      .highWaterMark(spark, dir, versions) == 74L)
  }
}
