package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Negative paths: the engine must fail LOUDLY (actionable message) or
  * degrade in the documented way — never return silently-wrong data.
  */
class ErrorPathSpec extends SparkSuite {

  test("unknown directory falls back to parquet detection and reads nothing"
      + " rather than fabricating rows") {
    val d = tmpDir("empty_table")
    // empty dir: detection says parquet; a graft read must yield an
    // explicit error or zero rows, never invented data
    val err = intercept[Exception] {
      spark.read.format("graft").load(d).count()
    }
    assert(err.getMessage != null)
  }

  test("corrupt JSON line in a Delta log fails the read with the path") {
    import spark.implicits._
    val table = tmpDir("corrupt_delta")
    // build a real converted Delta table first
    val src = tmpDir("corrupt_delta_src")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite")
      .parquet(src)
    val s = new graft.sources.ParquetDirectorySource(spark, src, "t")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, table)),
      s.currentSnapshot(), s.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"))
    // append garbage to the newest log file
    val log = Files.list(Paths.get(table, "_delta_log")).toArray
      .map(_.toString).filter(_.endsWith(".json")).sorted.last
    Files.writeString(Paths.get(log),
      Files.readString(Paths.get(log)) + "{not json at all\n")
    val err = intercept[Exception] {
      spark.read.format("graft").load(table).count()
    }
    // the failure must not be a silent partial read: the error chain has
    // to name the corrupt log line / file, not just throw "something"
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(err).mkString("\n")
    assert(all.contains("not json") || all.toLowerCase.contains("json") ||
      all.contains("_delta_log"), s"unhelpful failure: $all")
  }

  test("stray non-parquet file in a parquet directory is not counted as data") {
    import spark.implicits._
    val d = tmpDir("stray_files")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(d)
    Files.writeString(Paths.get(d, "README.txt"), "not data")
    Files.writeString(Paths.get(d, "_SUCCESS"), "")
    val src = new graft.sources.ParquetDirectorySource(spark, d, "t")
    val snap = src.currentSnapshot()
    val files = snap.files.collect()
    assert(files.forall(_.path.endsWith(".parquet")),
      s"non-parquet files leaked into the listing: ${files.map(_.path).toSeq}")
    assert(snap.files.count() >= 1)
  }

  test("MOR real-time view refusal names the pending file groups") {
    // written by HudiSyncSpec-style fixture: a base commit + a log-only
    // deltacommit must make queryType=snapshot refuse
    val table = tmpDir("mor_refusal")
    import spark.implicits._
    val src = tmpDir("mor_refusal_src")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(src)
    val s0 = new graft.sources.ParquetDirectorySource(spark, src, "t")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.hudi.HudiConversionTarget(spark, table)),
      s0.currentSnapshot(), s0.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"))
    // fabricate a deltacommit whose write stat targets a log file
    val ts = "99990101000000000"
    val fileId = "00000000-0000-0000-0000-000000000001-0"
    val logStat = s"""{"partitionToWriteStats":{"":[{"fileId":"$fileId",""" +
      s""""path":".$fileId.log.1_0-1-1","numWrites":1,"totalWriteBytes":10,""" +
      """"fileSizeInBytes":10}]},"operationType":"UPSERT"}"""
    Files.writeString(
      Paths.get(table, ".hoodie", s"$ts.deltacommit.requested"), "{}")
    Files.writeString(
      Paths.get(table, ".hoodie", s"$ts.deltacommit.inflight"), "{}")
    Files.writeString(Paths.get(table, ".hoodie", s"$ts.deltacommit"),
      logStat)
    val rt = new graft.formats.hudi.HudiConversionSource(spark, table, "t",
      queryType = "snapshot")
    val err = intercept[UnsupportedOperationException] {
      rt.currentSnapshot()
    }
    assert(err.getMessage.contains("read_optimized"),
      s"refusal message should point at the supported mode: ${err.getMessage}")
  }

  test("graft reader option matrix: every combination serves or refuses loudly") {
    // one Delta table to probe against
    val dataDir = tmpDir("optmx_data")
    spark.read.parquet(sf("sf0.001/region.parquet"))
      .write.mode("overwrite").parquet(dataDir)
    val t = tmpDir("optmx_delta")
    val src = new graft.sources.ParquetDirectorySource(spark, dataDir, "region")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, t)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    def refuse(opts: (String, String)*): String = {
      val e = intercept[IllegalArgumentException] {
        opts.foldLeft(spark.read.format("graft")) {
          case (r, (k, v)) => r.option(k, v)
        }.load(t).count()
      }
      e.getMessage
    }
    // startingVersion/endingVersion outside a change-feed read: refused,
    // not silently ignored
    assert(refuse("startingVersion" -> "0").contains("readChangeFeed"))
    assert(refuse("endingVersion" -> "1").contains("readChangeFeed"))
    // change feed is itself a version range: no time travel on top
    assert(refuse("readChangeFeed" -> "true", "startingVersion" -> "0",
      "versionAsOf" -> "0").contains("mutually"))
    // metadata tables serve the current snapshot only
    assert(refuse("metaTable" -> "history", "versionAsOf" -> "0")
      .contains("metaTable"))
    assert(refuse("metaTable" -> "files", "readChangeFeed" -> "true",
      "startingVersion" -> "0").contains("metaTable"))
    // versionAsOf + timestampAsOf / + branch: mutually exclusive
    assert(refuse("versionAsOf" -> "0", "timestampAsOf" -> "0")
      .contains("mutually exclusive"))
    assert(refuse("versionAsOf" -> "0", "branch" -> "b")
      .contains("mutually exclusive"))
    // branch on a non-Iceberg table: documented refusal
    assert(refuse("branch" -> "b").contains("Iceberg"))
    // tableFormat is the writer's format selector — reads auto-detect
    assert(refuse("tableFormat" -> "iceberg").contains("WRITE option"))
    // the servable combinations still serve
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(t).count() > 0)
    assert(spark.read.format("graft").option("metaTable", "history")
      .load(t).count() > 0)
  }

  test("mergeInto refusals: duplicate source keys, missing columns, " +
      "non-value Paimon partitions") {
    val dataDir = tmpDir("mrgerr_data")
    val region = spark.read.parquet(sf("sf0.001/region.parquet"))
    region.write.mode("overwrite").parquet(dataDir)
    val t = tmpDir("mrgerr_delta")
    val src = new graft.sources.ParquetDirectorySource(
      spark, dataDir, "region")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, t)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    val dup = region.limit(1).unionByName(region.limit(1))
    val e1 = intercept[IllegalArgumentException](
      graft.formats.delta.DeltaDeletes.mergeInto(spark, t, dup,
        Seq("r_regionkey")))
    assert(e1.getMessage.contains("duplicate keys"))

    val e2 = intercept[IllegalArgumentException](
      graft.formats.delta.DeltaDeletes.mergeInto(spark, t,
        region.drop("r_name"), Seq("r_regionkey")))
    assert(e2.getMessage.contains("lacks table columns"))

    val tp = tmpDir("mrgerr_paimon")
    val outP = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.paimon.PaimonConversionTarget(spark, tp)),
      src.currentSnapshot(), src.sourceFormat)
    assert(outP.forall(_.status == "SUCCESS"), outP.mkString(";"))
    val e3 = intercept[IllegalArgumentException](
      graft.formats.paimon.PaimonDeletes.mergeInto(spark, tp, dup,
        Seq("r_regionkey")))
    assert(e3.getMessage.contains("duplicate keys"))
    val e4 = intercept[IllegalArgumentException](
      graft.formats.paimon.PaimonDeletes.mergeInto(spark, tp, region,
        Seq("no_such_key")))
    assert(e4.getMessage.contains("key columns"))
  }

  test("unimplemented Delta reader features and Iceberg v3 refuse, " +
    "implemented features serve") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    // a features-protocol table demanding variantType must refuse BEFORE
    // serving any row (PROTOCOL.md §Reader Requirements); one naming only
    // implemented features must serve
    def mkTable(prefix: String, protoLine: String): String = {
      val t = tmpDir(prefix)
      Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(t + "/stage")
      val part = new java.io.File(t + "/stage").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(t, "f1.parquet"))
      val schemaJson = Seq((1L, "a")).toDF("id", "name")
        .schema.json.replace("\"", "\\\"")
      val log =
        s"""$protoLine
           |{"metaData":{"id":"rf-test","schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}
           |{"add":{"path":"f1.parquet","size":${Files.size(Paths.get(t, "f1.parquet"))},"modificationTime":1000,"partitionValues":{},"dataChange":true}}
           |""".stripMargin
      Files.createDirectories(Paths.get(t, "_delta_log"))
      Files.write(Paths.get(t, "_delta_log", "00000000000000000000.json"),
        log.getBytes("UTF-8"))
      t
    }
    val bad = mkTable("rf_bad",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","variantType"],"writerFeatures":["variantType"]}}""")
    val e = intercept[UnsupportedOperationException] {
      new graft.formats.delta.DeltaConversionSource(spark, bad, "t")
        .currentSnapshot()
    }
    assert(e.getMessage.contains("variantType"), e.getMessage)

    val ok = mkTable("rf_ok",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","timestampNtz"],"writerFeatures":["deletionVectors"]}}""")
    assert(new graft.formats.delta.DeltaConversionSource(spark, ok, "t")
      .toDataFrame.count() == 2)

    // Iceberg format-version 3 READS since r13 (deletion vectors) — but
    // v4 still refuses at metadata read, and a v3 table with a non-null
    // initial-default refuses (serving old files without the default
    // would be a wrong answer)
    def iceMeta(prefix: String, body: String): String = {
      val t = tmpDir(prefix)
      Files.createDirectories(Paths.get(
        graft.formats.iceberg.IcebergMetadata.metadataDir(t)))
      Files.write(Paths.get(
        graft.formats.iceberg.IcebergMetadata.metadataFile(t, 1)),
        body.getBytes("UTF-8"))
      t
    }
    def iceBody(version: Int, fieldExtra: String): String =
      s"""{"format-version":$version,"table-uuid":"u","location":"x",
         |"last-sequence-number":0,"last-updated-ms":1,"last-column-id":1,
         |"next-row-id":0,
         |"current-schema-id":0,"schemas":[{"schema-id":0,"type":"struct",
         |"fields":[{"id":1,"name":"id","required":true,"type":"long"$fieldExtra}]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"current-snapshot-id":-1,"snapshots":[]}""".stripMargin
    val v3ok = iceMeta("rf_ice_v3", iceBody(3, ""))
    val m3 = graft.formats.iceberg.IcebergMetadata.read(v3ok, 1)
    assert(m3.formatVersion == 3 && m3.nextRowId == 0L)
    val v4 = iceMeta("rf_ice_v4", iceBody(4, ""))
    val e2 = intercept[UnsupportedOperationException] {
      graft.formats.iceberg.IcebergMetadata.read(v4, 1)
    }
    assert(e2.getMessage.contains("format-version 4"), e2.getMessage)
    // a REPRESENTABLE scalar initial-default now SERVES (r14): the
    // default rides the schema as EXISTS_DEFAULT for the scan to fill
    val v3def = iceMeta("rf_ice_v3def",
      iceBody(3, ""","initial-default":7"""))
    val mDef = graft.formats.iceberg.IcebergMetadata.read(v3def, 1)
    assert(mDef.schema("id").metadata.getString("EXISTS_DEFAULT") == "7L",
      mDef.schema("id").metadata.json)
    // a DECIMAL default serves since r15 (spec single-value JSON string,
    // exact scale preserved through the catalyst literal)
    val v3dec = iceMeta("rf_ice_v3dec",
      """{"format-version":3,"table-uuid":"u","location":"x",
        |"last-sequence-number":0,"last-updated-ms":1,"last-column-id":1,
        |"next-row-id":0,
        |"current-schema-id":0,"schemas":[{"schema-id":0,"type":"struct",
        |"fields":[{"id":1,"name":"d","required":false,
        |"type":"decimal(10,2)","initial-default":"7.00"}]}],
        |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
        |"current-snapshot-id":-1,"snapshots":[]}""".stripMargin)
    val mDec = graft.formats.iceberg.IcebergMetadata.read(v3dec, 1)
    assert(mDec.schema("d").metadata.getString("EXISTS_DEFAULT") == "7.00BD",
      mDec.schema("d").metadata.json)
    // an UNSERVABLE default still refuses rather than serving wrong
    // values — binary, which the vectorized scan cannot fill
    val v3bad = iceMeta("rf_ice_v3bad",
      """{"format-version":3,"table-uuid":"u","location":"x",
        |"last-sequence-number":0,"last-updated-ms":1,"last-column-id":1,
        |"next-row-id":0,
        |"current-schema-id":0,"schemas":[{"schema-id":0,"type":"struct",
        |"fields":[{"id":1,"name":"b","required":false,
        |"type":"binary","initial-default":"0102"}]}],
        |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
        |"current-snapshot-id":-1,"snapshots":[]}""".stripMargin)
    val e3 = intercept[UnsupportedOperationException] {
      graft.formats.iceberg.IcebergMetadata.read(v3bad, 1)
    }
    assert(e3.getMessage.contains("initial-default") &&
      e3.getMessage.contains("binary"), e3.getMessage)
  }

  test("unmaintainable writer features, appendOnly DML, and Hudi 1.x " +
    "layout all refuse writes/reads") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.lit
    def mkDelta(prefix: String, protoLine: String,
        config: String = "{}"): String = {
      val t = tmpDir(prefix)
      Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(t + "/stage")
      val part = new java.io.File(t + "/stage").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(t, "f1.parquet"))
      val schemaJson = Seq((1L, "a")).toDF("id", "name")
        .schema.json.replace("\"", "\\\"")
      val log =
        s"""$protoLine
           |{"metaData":{"id":"wf-test","schemaString":"$schemaJson","partitionColumns":[],"configuration":$config,"createdTime":1}}
           |{"add":{"path":"f1.parquet","size":${Files.size(Paths.get(t, "f1.parquet"))},"modificationTime":1000,"partitionValues":{},"dataChange":true}}
           |""".stripMargin
      Files.createDirectories(Paths.get(t, "_delta_log"))
      Files.write(Paths.get(t, "_delta_log", "00000000000000000000.json"),
        log.getBytes("UTF-8"))
      t
    }
    // rowTracking is MAINTAINED since r15 (DeltaRowTracking): an append
    // on an externally-created rowTracking table lands with fresh base
    // ids and the advanced high-water mark in the same commit
    val rt = mkDelta("wf_rowtracking",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking"]}}""")
    graft.formats.delta.DeltaWrite.write(spark, rt,
      Seq((9L, "z")).toDF("id", "name"), overwrite = false)
    val rtVersions = graft.formats.delta.DeltaLog.listVersions(rt,
      graft.util.HadoopConfs.session(spark))
    assert(graft.formats.delta.DeltaRowTracking
      .highWaterMark(spark, rt, rtVersions) == 0L)
    assert(new graft.formats.delta.DeltaConversionSource(spark, rt, "t")
      .toDataFrame.count() == 3)
    // the fixture's ORIGINAL add carries no baseRowId (feature present,
    // never assigned) — the lineage read must fail loudly for that
    // file's rows, never invent ids
    val eLin = intercept[Exception] {
      spark.read.format("graft").option("withRowLineage", "true")
        .load(rt).collect()
    }
    assert(eLin.toString.contains("row tracking unresolvable") ||
      Option(eLin.getCause).exists(
        _.toString.contains("row tracking unresolvable")) ||
      eLin.toString.contains("USER_RAISED_EXCEPTION"), eLin.toString)

    // identityColumns remains genuinely unmaintained — writes refuse
    val idc = mkDelta("wf_identity",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["identityColumns"]}}""")
    val e1 = intercept[UnsupportedOperationException] {
      graft.formats.delta.DeltaWrite.write(spark, idc,
        Seq((9L, "z")).toDF("id", "name"), overwrite = false)
    }
    assert(e1.getMessage.contains("identityColumns"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException] {
      graft.formats.delta.DeltaDeletes.deleteWhere(spark, idc,
        org.apache.spark.sql.functions.col("id") === 1L)
    }
    assert(e2.getMessage.contains("identityColumns"), e2.getMessage)
    // reads stay fine — both are writer-only features
    assert(new graft.formats.delta.DeltaConversionSource(spark, idc, "t")
      .toDataFrame.count() == 2)

    // appendOnly: appends land, row-removing DML refuses
    val ao = mkDelta("wf_appendonly",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly"]}}""",
      config = """{"delta.appendOnly":"true"}""")
    graft.formats.delta.DeltaWrite.write(spark, ao,
      Seq((9L, "z")).toDF("id", "name"), overwrite = false)
    val e3 = intercept[IllegalArgumentException] {
      graft.formats.delta.DeltaDeletes.deleteWhere(spark, ao,
        org.apache.spark.sql.functions.col("id") === 1L)
    }
    assert(e3.getMessage.contains("append-only"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      graft.formats.delta.DeltaDeletes.updateWhere(spark, ao,
        org.apache.spark.sql.functions.col("id") === 1L,
        Map("name" -> lit("x")))
    }
    assert(e4.getMessage.contains("append-only"), e4.getMessage)

    // Hudi 1.x (table version 8): READ natively since r13 — listing
    // serves the timeline-dir completed instants by request time
    val h = tmpDir("hudi_v8")
    Files.createDirectories(Paths.get(h, ".hoodie", "timeline"))
    Files.write(Paths.get(h, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\nhoodie.table.version=8\n"
        .getBytes("UTF-8"))
    Files.write(Paths.get(h, ".hoodie", "timeline",
      "20240101000000000_20240101000000001.commit"), "{}".getBytes("UTF-8"))
    assert(graft.formats.hudi.HudiTimeline.listInstants(h) ==
      Seq("20240101000000000"))
    // writes into the 1.x layout still refuse (graft writes the v6
    // dialect; legacy-located instants would fork the timeline)
    val e5 = intercept[UnsupportedOperationException] {
      graft.formats.hudi.HudiTimeline.writeCommit(
        graft.formats.hudi.HudiTimeline.CommitMeta("20240101000000002",
          "commit", Map.empty, Map.empty, Map.empty), h)
    }
    assert(e5.getMessage.contains("1.x"), e5.getMessage)

    // a FUTURE table version (> 9) still refuses to read — unknown layout
    val h2 = tmpDir("hudi_v10")
    Files.createDirectories(Paths.get(h2, ".hoodie", "timeline"))
    Files.write(Paths.get(h2, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\nhoodie.table.version=10\n"
        .getBytes("UTF-8"))
    val e6 = intercept[UnsupportedOperationException] {
      graft.formats.hudi.HudiTimeline.listInstants(h2)
    }
    assert(e6.getMessage.contains("newer"), e6.getMessage)
  }

  test("v3 new-type refusals NAME the type and spec version") {
    // spec v3 adds timestamp_ns/timestamptz_ns/variant/geometry/
    // geography/unknown; none has a lossless Spark mapping. The refusal
    // must name the type (and why) — a generic "unsupported type" sends
    // the operator reading schema JSON by hand.
    def schemaWith(t: String): String =
      s"""{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"c","required":false,"type":"$t"}]}""".stripMargin
    for (t <- Seq("timestamp_ns", "timestamptz_ns")) {
      val e = intercept[UnsupportedOperationException] {
        graft.formats.iceberg.IcebergSchemas.fromIcebergJson(schemaWith(t))
      }
      assert(e.getMessage.contains(t) && e.getMessage.contains("v3") &&
        e.getMessage.contains("nanosecond"), s"$t: ${e.getMessage}")
    }
    for (t <- Seq("variant", "geometry", "geography", "unknown")) {
      val e = intercept[UnsupportedOperationException] {
        graft.formats.iceberg.IcebergSchemas.fromIcebergJson(schemaWith(t))
      }
      assert(e.getMessage.contains(t) && e.getMessage.contains("v3"),
        s"$t: ${e.getMessage}")
    }
    val e = intercept[UnsupportedOperationException] {
      graft.formats.iceberg.IcebergSchemas.fromIcebergJson(
        schemaWith("time"))
    }
    assert(e.getMessage.contains("time") &&
      e.getMessage.contains("no Spark column type"), e.getMessage)
  }
}
