package graft

import org.apache.spark.sql.functions._

import graft.formats.delta._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** The GRAFT SQL surface: parser injection via SparkSessionExtensions,
  * command execution, delegation of everything else.
  */
class SqlSurfaceSpec extends SparkSuite {

  private lazy val gs = graft.sql.GraftSql.session(spark)

  private def deltaTable(prefix: String): String = {
    val dataDir = tmpDir(s"${prefix}_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").repartition(2)
      .write.mode("overwrite").parquet(dataDir)
    val t = tmpDir(s"${prefix}_delta")
    val src = new ParquetDirectorySource(spark, dataDir, "nation")
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, t)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    t
  }

  test("GRAFT DELETE / UPDATE / OPTIMIZE / RESTORE round-trip through SQL") {
    val t = deltaTable("sql_rt")
    val total = spark.read.parquet(sf("sf0.001") + "/nation.parquet").count()
    val deleted = gs.sql(s"GRAFT DELETE FROM '$t' WHERE n_nationkey % 2 = 0")
      .head().getLong(0)
    assert(deleted > 0)
    assert(new DeltaConversionSource(spark, t, "nation").toDataFrame.count()
      == total - deleted)
    val upd = gs.sql(
      s"GRAFT UPDATE '$t' SET n_regionkey = n_regionkey + 10, " +
        s"n_name = upper(n_name) WHERE n_nationkey = 1").head().getLong(0)
    assert(upd == 1)
    val opt = gs.sql(s"GRAFT OPTIMIZE '$t'").head()
    assert(opt.getLong(0) >= 2)
    val restored = gs.sql(s"GRAFT RESTORE '$t' TO VERSION 0").head()
    assert(restored.getLong(2) > 0)
    assert(new DeltaConversionSource(spark, t, "nation").toDataFrame.count()
      == total)
  }

  test("GRAFT ZORDER and VACUUM parse with their optional clauses") {
    val t = deltaTable("sql_z")
    val z = gs.sql(
      s"GRAFT OPTIMIZE '$t' ZORDER BY (n_nationkey, n_regionkey)").head()
    assert(z.getLong(0) == 2)
    // a second rewrite supersedes the zorder output (which lives IN the
    // table dir, unlike the synced source files) — vacuum(0) must sweep it
    val z2 = gs.sql(s"GRAFT OPTIMIZE '$t' ZORDER BY (n_nationkey)").head()
    assert(z2.getLong(0) >= 1)
    val swept = gs.sql(s"GRAFT VACUUM '$t' RETAIN 0 HOURS").head().getLong(0)
    assert(swept >= 1)
    assert(new DeltaConversionSource(spark, t, "nation").toDataFrame.count()
      == spark.read.parquet(sf("sf0.001") + "/nation.parquet").count())
  }

  test("GRAFT SYNC converts a parquet directory through SQL") {
    val dataDir = tmpDir("sql_sync_data")
    spark.read.parquet(sf("sf0.001") + "/region.parquet").repartition(2)
      .write.mode("overwrite").parquet(dataDir)
    val t = tmpDir("sql_sync_delta")
    val row = gs.sql(
      s"GRAFT SYNC PARQUET '$dataDir' AS region TO delta '$t'").head()
    assert(row.getString(0) == "DELTA" && row.getString(1) == "SUCCESS")
    assert(new DeltaConversionSource(spark, t, "region").toDataFrame.count()
      == spark.read.parquet(sf("sf0.001") + "/region.parquet").count())
    // second sync is incremental (no new source commits → still SUCCESS)
    val again = gs.sql(
      s"GRAFT SYNC PARQUET '$dataDir' AS region TO delta '$t'").head()
    assert(again.getString(1) == "SUCCESS")
  }

  test("GRAFT CREATE/DROP BRANCH and the refs metadata table") {
    val dataDir = tmpDir("sql_ref_data")
    spark.read.parquet(sf("sf0.001") + "/region.parquet").repartition(2)
      .write.mode("overwrite").parquet(dataDir)
    val t = tmpDir("sql_ref_ice")
    gs.sql(s"GRAFT SYNC PARQUET '$dataDir' AS region TO iceberg '$t'")
    gs.sql(s"GRAFT CREATE TAG v1 ON '$t' AT SEQUENCE 1")
    gs.sql(s"GRAFT CREATE BRANCH dev ON '$t'")
    val refs = spark.read.format("graft").option("metaTable", "refs")
      .load(t).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs == Set(("main", "branch"), ("v1", "tag"),
      ("dev", "branch")))
    gs.sql(s"GRAFT DROP BRANCH dev ON '$t'")
    assert(spark.read.format("graft").option("metaTable", "refs")
      .load(t).count() == 2)
    // tag still reads through the reader option
    assert(spark.read.format("graft").option("branch", "v1").load(t)
      .count() == spark.read.parquet(sf("sf0.001") + "/region.parquet")
      .count())
  }

  test("GRAFT MERGE INTO upserts by key through SQL on a Delta table") {
    val t = deltaTable("sql_merge")
    val nation = spark.read.parquet(sf("sf0.001") + "/nation.parquet")
    val srcDir = tmpDir("sql_merge_src")
    nation.filter(org.apache.spark.sql.functions.col("n_nationkey") < 3)
      .withColumn("n_name", org.apache.spark.sql.functions.lit("XX"))
      .unionByName(nation
        .filter(org.apache.spark.sql.functions.col("n_nationkey") < 2)
        .withColumn("n_nationkey", org.apache.spark.sql.functions
          .col("n_nationkey") + 100))
      .write.mode("overwrite").parquet(srcDir)
    val r = gs.sql(s"GRAFT MERGE INTO '$t' USING '$srcDir' " +
      "ON KEYS (n_nationkey)").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2, r.toString)
    val back = new DeltaConversionSource(spark, t, "nation").toDataFrame
    assert(back.count() == nation.count() + 2)
    assert(back.filter(org.apache.spark.sql.functions.col("n_name") ===
      "XX").count() == 3)
    // malformed MERGE refuses with the statement inventory
    val e = intercept[Exception](
      gs.sql(s"GRAFT MERGE '$t' USING '$srcDir'"))
    assert(e.getMessage.contains("MERGE INTO"))
  }

  test("OPTIMIZE and RESTORE route by format: iceberg rewrite, hudi " +
      "compaction + savepoint restore, loud refusals elsewhere") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.{col, lit}
    // --- iceberg: delete leaves delete files; OPTIMIZE rewrites them away
    val iceData = tmpDir("sqlopt_ice_data")
    spark.read.parquet(sf("sf0.001/nation.parquet"))
      .write.mode("overwrite").parquet(iceData)
    val ice = tmpDir("sqlopt_ice")
    val isrc = new graft.sources.ParquetDirectorySource(
      spark, iceData, "nation")
    assert(graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, ice)),
      isrc.currentSnapshot(), isrc.sourceFormat)
      .forall(_.status == "SUCCESS"))
    val deleted = graft.formats.iceberg.IcebergDeletes.deleteWhere(
      spark, ice, col("n_nationkey") % 2 === 0)
    assert(deleted > 0)
    val opt = gs.sql(s"GRAFT OPTIMIZE '$ice'").head()
    assert(opt.getLong(0) == 1L && opt.getLong(1) >= 1L, opt.toString)
    val back = new graft.formats.iceberg.IcebergConversionSource(
      spark, ice, "nation").toDataFrame
    assert(back.filter(col("n_nationkey") % 2 === 0).isEmpty)
    assert(back.count() == 25 - deleted)
    // WHERE scoping refuses on iceberg instead of being ignored
    val ew = intercept[Exception](
      gs.sql(s"GRAFT OPTIMIZE '$ice' WHERE n_nationkey > 0"))
    assert(ew.getMessage.contains("whole-table"))

    // --- hudi MOR: upsert logs, OPTIMIZE compacts, RESTORE rolls back
    val hudi = tmpDir("sqlopt_hudi")
    Files.copy(Paths.get(sf("sf0.001/nation.parquet")),
      Paths.get(hudi, "base1.parquet"))
    val base = s"$hudi/base1.parquet"
    val df = spark.read.parquet(base)
    graft.formats.hudi.HudiTimeline.writeProperties(hudi, "nation",
      "MERGE_ON_READ")
    assert(graft.formats.hudi.HudiTimeline.writeCommit(
      graft.formats.hudi.HudiTimeline.CommitMeta("100", "commit",
        Map("" -> Seq(graft.formats.hudi.HudiTimeline.WriteStat(
          graft.formats.hudi.HudiTimeline.fileId(base), "base1.parquet",
          df.count(), Files.size(Paths.get(base))))),
        Map.empty, Map("schema" -> df.schema.json)), hudi))
    graft.formats.hudi.HudiLogFiles.upsert(spark, hudi,
      df.limit(3).withColumn("n_name", lit("XX")), Seq("n_nationkey"))
    val copt = gs.sql(s"GRAFT OPTIMIZE '$hudi'").head()
    assert(copt.getLong(0) == df.count(), copt.toString)
    val rt = new graft.formats.hudi.HudiConversionSource(
      spark, hudi, "nation", "snapshot").toDataFrame
    assert(rt.filter(col("n_name") === "XX").count() == 3)
    // savepoint restore to the first commit drops the later instants
    val restored = gs.sql(s"GRAFT RESTORE '$hudi' TO VERSION 100").head()
    assert(restored.getLong(2) == 100L)
    assert(graft.formats.hudi.HudiTimeline.listInstants(hudi)
      == Seq("100"))
    // iceberg RESTORE points at ROLLBACK
    val er = intercept[Exception](
      gs.sql(s"GRAFT RESTORE '$ice' TO VERSION 1"))
    assert(er.getMessage.contains("ROLLBACK"))
  }

  test("non-GRAFT SQL delegates untouched; unknown GRAFT refuses") {
    assert(gs.sql("SELECT 1 + 1 AS x").head().getInt(0) == 2)
    assert(gs.range(3).count() == 3)
    val e = intercept[IllegalArgumentException] {
      gs.sql("GRAFT FROBNICATE 'x'")
    }
    assert(e.getMessage.contains("unrecognized GRAFT"))
  }

  test("SET-clause splitting respects nested parens and strings") {
    val p = new graft.sql.GraftSqlParser(null)
    assert(p.splitAssignments("a = f(x, y), b = 'q,r', c = 1") ==
      Seq("a" -> "f(x, y)", "b" -> "'q,r'", "c" -> "1"))
  }

  test("DELETE/UPDATE route by table format; CLONE forks zero-copy") {
    // ICEBERG: position-delete commit + equality-update through one SQL
    val iceData = tmpDir("sqlx_ice_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").repartition(2)
      .write.mode("overwrite").parquet(iceData)
    val ice = tmpDir("sqlx_ice")
    gs.sql(s"GRAFT SYNC PARQUET '$iceData' AS nation TO iceberg '$ice'")
      .collect()
    val delIce = gs.sql(
      s"GRAFT DELETE FROM '$ice' WHERE n_nationkey % 5 = 0")
      .head().getLong(0)
    assert(delIce > 0)
    val updIce = gs.sql(s"GRAFT UPDATE '$ice' SET n_regionkey = 9 " +
      "WHERE n_nationkey = 1").head().getLong(0)
    assert(updIce == 1)
    val iceBack = new graft.formats.iceberg.IcebergConversionSource(
      spark, ice, "nation").toDataFrame
    assert(iceBack.where("n_nationkey % 5 = 0").count() == 0)
    assert(iceBack.where("n_nationkey = 1").head()
      .getAs[Number]("n_regionkey").intValue() == 9)

    // PAIMON: copy-on-write swap through the same statements
    val pai = tmpDir("sqlx_pai")
    gs.sql(s"GRAFT SYNC PARQUET '$iceData' AS nation TO paimon '$pai'")
      .collect()
    assert(gs.sql(s"GRAFT DELETE FROM '$pai' WHERE n_nationkey % 5 = 0")
      .head().getLong(0) > 0)
    assert(gs.sql(s"GRAFT UPDATE '$pai' SET n_regionkey = 9 " +
      "WHERE n_nationkey = 1").head().getLong(0) == 1)
    val paiBack = new graft.formats.paimon.PaimonConversionSource(
      spark, pai, "nation").toDataFrame
    assert(paiBack.where("n_nationkey % 5 = 0").count() == 0)
    assert(paiBack.where("n_nationkey = 1").head()
      .getAs[Number]("n_regionkey").intValue() == 9)

    // CLONE: zero-copy fork with independent history
    val base = deltaTable("sqlx_clone")
    val dst = tmpDir("sqlx_clone_dst") + "/t"
    val cloned = gs.sql(s"GRAFT CLONE '$base' TO '$dst'").head()
    assert(cloned.getLong(0) > 0 && cloned.getLong(1) == 0L)
    gs.sql(s"GRAFT DELETE FROM '$dst' WHERE n_nationkey >= 0").collect()
    assert(new DeltaConversionSource(spark, dst, "nation")
      .toDataFrame.count() == 0)
    assert(new DeltaConversionSource(spark, base, "nation")
      .toDataFrame.count() > 0)
  }

  test("GRAFT DELETE on a v3 Iceberg table routes into deletion vectors") {
    val iceData = tmpDir("sqlx_v3_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").coalesce(1)
      .write.mode("overwrite").parquet(iceData)
    val ice = tmpDir("sqlx_v3")
    gs.sql(s"GRAFT SYNC PARQUET '$iceData' AS nation TO iceberg '$ice'")
      .collect()
    // upgrade to v3 with a first DV commit
    val f = new graft.formats.iceberg.IcebergConversionSource(
      spark, ice, "nation").currentSnapshot().files.collect()(0)
    graft.formats.iceberg.IcebergDeletes.appendDeletionVectors(spark, ice,
      Map(f.path -> Seq(0L)))
    // the SAME SQL statement now lands a DV (merged — still one per file)
    val n = gs.sql(s"GRAFT DELETE FROM '$ice' WHERE n_nationkey % 5 = 0")
      .head().getLong(0)
    assert(n > 0)
    val m = graft.formats.iceberg.IcebergMetadata.read(ice,
      graft.formats.iceberg.IcebergMetadata.currentVersion(ice).get)
    assert(m.formatVersion == 3)
    val refs = graft.formats.iceberg.IcebergDeletes
      .liveDeleteRefs(m, m.headSequence)
    assert(refs.size == 1 && refs.head.isDeletionVector, refs.toString)
    val back = new graft.formats.iceberg.IcebergConversionSource(
      spark, ice, "nation").toDataFrame
    assert(back.where("n_nationkey % 5 = 0").count() == 0)
    // v3 UPDATE works through SQL since r14 (lineage-preserving rewrite)
    val nUpd = gs.sql(s"GRAFT UPDATE '$ice' SET n_regionkey = 9 " +
      "WHERE n_nationkey = 1").head().getLong(0)
    assert(nUpd == 1L)
    assert(new graft.formats.iceberg.IcebergConversionSource(
        spark, ice, "nation").toDataFrame
      .where("n_nationkey = 1").head().getAs[Number]("n_regionkey")
      .longValue == 9L)
  }

  test("ALTER TABLE SET TBLPROPERTIES format-version upgrades to v3 " +
    "through SQL") {
    val iceData = tmpDir("sqlx_fv_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").coalesce(1)
      .write.mode("overwrite").parquet(iceData)
    val ice = tmpDir("sqlx_fv")
    gs.sql(s"GRAFT SYNC PARQUET '$iceData' AS nation TO iceberg '$ice'")
      .collect()
    gs.sql(s"GRAFT ALTER TABLE '$ice' SET TBLPROPERTIES " +
      "('format-version'='3')").collect()
    val m = graft.formats.iceberg.IcebergMetadata.read(ice,
      graft.formats.iceberg.IcebergMetadata.currentVersion(ice).get)
    assert(m.formatVersion == 3)
    assert(m.nextRowId == 25L, m.nextRowId)
    // DML on the upgraded table: DELETE lands a DV, UPDATE preserves
    assert(gs.sql(s"GRAFT DELETE FROM '$ice' WHERE n_nationkey = 3")
      .head().getLong(0) == 1L)
    assert(gs.sql(s"GRAFT UPDATE '$ice' SET n_name = 'x' " +
      "WHERE n_nationkey = 4").head().getLong(0) == 1L)
    // an unsupported target version refuses loudly
    val e = intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$ice' SET TBLPROPERTIES " +
        "('format-version'='4')").collect()
    }
    assert(e.getMessage.contains("format-version 3"), e.getMessage)

    // ADD COLUMN ... DEFAULT on a fresh v3 table (the ALTER's schema
    // commit refuses while row-level deletes are live — same file-level
    // guard as sync): pre-existing rows serve the default
    val ice2 = tmpDir("sqlx_fv_def")
    gs.sql(s"GRAFT SYNC PARQUET '$iceData' AS nation TO iceberg '$ice2'")
      .collect()
    gs.sql(s"GRAFT ALTER TABLE '$ice2' SET TBLPROPERTIES " +
      "('format-version'='3')").collect()
    gs.sql(s"GRAFT ALTER TABLE '$ice2' ADD COLUMN region string " +
      "DEFAULT 'emea'").collect()
    val served = new graft.formats.iceberg.IcebergConversionSource(
      spark, ice2, "nation").toDataFrame
    assert(served.columns.contains("region"))
    assert(served.select("region").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("emea"))
    // the schema JSON carries the spec's default keys
    val metaJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        graft.formats.iceberg.IcebergMetadata.metadataFile(ice2,
          graft.formats.iceberg.IcebergMetadata.currentVersion(ice2).get))))
    val compact = metaJson.replaceAll("\\s", "")
    assert(compact.contains("\"initial-default\":\"emea\"") &&
      compact.contains("\"write-default\":\"emea\""),
      compact.take(600))

    // NON-SCALAR defaults (r14 punch list): struct literals land as the
    // spec's field-id-keyed single-value and serve back; decimal as the
    // exact-scale JSON string; timestamp with the +00:00 offset form
    gs.sql(s"GRAFT ALTER TABLE '$ice2' ADD COLUMN audit " +
      "struct<source:string,score:int> " +
      "DEFAULT named_struct('source', 'import', 'score', 7)").collect()
    gs.sql(s"GRAFT ALTER TABLE '$ice2' ADD COLUMN fee decimal(9,2) " +
      "DEFAULT 14.20").collect()
    gs.sql(s"GRAFT ALTER TABLE '$ice2' ADD COLUMN seen timestamp " +
      "DEFAULT TIMESTAMP '2017-11-16 22:31:08.123456'").collect()
    val served2 = new graft.formats.iceberg.IcebergConversionSource(
      spark, ice2, "nation").toDataFrame
    val row = served2.select("audit", "fee", "seen").distinct().collect()
    assert(row.length == 1, row.mkString(","))
    val audit = row.head.getStruct(0)
    assert(audit.getString(0) == "import" && audit.getInt(1) == 7,
      audit.toString)
    assert(row.head.getDecimal(1).toPlainString == "14.20")
    assert(row.head.getTimestamp(2).toInstant ==
      java.time.Instant.parse("2017-11-16T22:31:08.123456Z"),
      row.head.getTimestamp(2).toString)
    val metaJson2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        graft.formats.iceberg.IcebergMetadata.metadataFile(ice2,
          graft.formats.iceberg.IcebergMetadata.currentVersion(ice2).get))))
    val compact2 = metaJson2.replaceAll("\\s", "")
    // struct single-value keyed by FIELD ID; decimal as a string;
    // timestamptz with explicit offset
    assert(compact2.contains("\"initial-default\":\"14.20\""),
      compact2.take(900))
    assert(compact2.contains("\"initial-default\":\"2017-11-16T22:31:08.123456+00:00\""),
      compact2.take(900))
    assert("\"initial-default\":\\{\"\\d+\":\"import\",\"\\d+\":7\\}".r
      .findFirstIn(compact2).isDefined, compact2.take(900))

    // a BINARY default refuses AT DDL TIME, naming the reason — the r14
    // silent-null: the old write side dropped unserializable defaults
    // from the schema JSON after the DDL succeeded
    val eBin = intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$ice2' ADD COLUMN blob binary " +
        "DEFAULT X'0102'").collect()
    }
    assert(eBin.getMessage.contains("binary") &&
      eBin.getMessage.contains("not servable"), eBin.getMessage)
  }

  test("ADD COLUMN DEFAULT refuses below v3 and on non-Iceberg tables") {
    val iceData = tmpDir("sqlx_def_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").coalesce(1)
      .write.mode("overwrite").parquet(iceData)
    val ice = tmpDir("sqlx_def_v2")
    gs.sql(s"GRAFT SYNC PARQUET '$iceData' AS nation TO iceberg '$ice'")
      .collect()
    val e = intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$ice' ADD COLUMN region string " +
        "DEFAULT 'emea'").collect()
    }
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
    val delta = deltaTable("sqlx_def_delta")
    val e2 = intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$delta' ADD COLUMN region string " +
        "DEFAULT 'emea'").collect()
    }
    assert(e2.getMessage.contains("Iceberg v3"), e2.getMessage)
  }

  test("CLONE copies the source protocol, not a hardcoded (1,2)") {
    import org.apache.spark.sql.functions.col
    val base = deltaTable("sqlx_clone_proto")
    // drive the source onto the table-features protocol: deleteWhere
    // raises to (3,7) with deletionVectors, OPTIMIZE then retires the
    // live DVs so the clone refusal doesn't trip
    assert(graft.formats.delta.DeltaDeletes.deleteWhere(spark, base,
      col("n_nationkey") === 0) == 1L)
    graft.formats.delta.DeltaOptimize.compact(spark, base)
    val conf = graft.util.HadoopConfs.session(spark)
    val srcProto = DeltaSnapshot.protocolInfo(spark, base,
      DeltaLog.listVersions(base, conf)).get
    assert(srcProto.minWriterVersion >= 7 &&
      srcProto.writerFeatures.contains("deletionVectors"), srcProto.toString)

    val dst = tmpDir("sqlx_clone_proto_dst") + "/t"
    graft.formats.delta.DeltaClone.shallowClone(spark, base, dst)
    val dstProto = DeltaSnapshot.protocolInfo(spark, dst,
      DeltaLog.listVersions(dst, conf)).get
    assert(dstProto == srcProto,
      s"clone protocol $dstProto != source $srcProto")
  }

  test("VACUUM routes by format: iceberg expires + sweeps, hudi cleans") {
    // ICEBERG: two snapshots; VACUUM expires the old one and sweeps its
    // now-unreferenced manifests/data past retention 0
    val data = tmpDir("sqlv_data")
    spark.read.parquet(sf("sf0.001") + "/region.parquet").repartition(2)
      .write.mode("overwrite").parquet(data)
    val ice = tmpDir("sqlv_ice")
    gs.sql(s"GRAFT SYNC PARQUET '$data' AS region TO iceberg '$ice'")
      .collect()
    gs.sql(s"GRAFT DELETE FROM '$ice' WHERE r_regionkey = 0").collect()
    val swept = gs.sql(s"GRAFT VACUUM '$ice' RETAIN 0 HOURS")
      .head().getLong(0)
    assert(swept >= 0)
    assert(new graft.formats.iceberg.IcebergConversionSource(
      spark, ice, "region").toDataFrame.count() == 4)
    // HUDI: resync makes an old instant's files cleanable
    val hudi = tmpDir("sqlv_hudi")
    gs.sql(s"GRAFT SYNC PARQUET '$data' AS region TO hudi '$hudi'").collect()
    assert(gs.sql(s"GRAFT VACUUM '$hudi'").head().getLong(0) >= 0)
  }

  test("VACUUM RETAIN window preserves in-window time travel on every " +
    "format (only Delta did before)") {
    val data = tmpDir("sqlvw_data")
    spark.read.parquet(sf("sf0.001") + "/region.parquet").repartition(2)
      .write.mode("overwrite").parquet(data)
    for (fmt <- Seq("iceberg", "paimon")) {
      val t = tmpDir(s"sqlvw_$fmt")
      gs.sql(s"GRAFT SYNC PARQUET '$data' AS region TO $fmt '$t'").collect()
      gs.sql(s"GRAFT DELETE FROM '$t' WHERE r_regionkey = 0").collect()
      val history = (fmt match {
        case "iceberg" =>
          graft.formats.iceberg.IcebergMetadata.read(t,
            graft.formats.iceberg.IcebergMetadata.currentVersion(t).get)
            .snapshots.size
        case _ => graft.formats.paimon.PaimonFormat.listSnapshotIds(t).size
      })
      assert(history >= 2, s"$fmt: want 2+ snapshots, got $history")
      // everything is seconds old: a week-long window expires NOTHING
      gs.sql(s"GRAFT VACUUM '$t' RETAIN 168 HOURS").collect()
      val after = (fmt match {
        case "iceberg" =>
          graft.formats.iceberg.IcebergMetadata.read(t,
            graft.formats.iceberg.IcebergMetadata.currentVersion(t).get)
            .snapshots.size
        case _ => graft.formats.paimon.PaimonFormat.listSnapshotIds(t).size
      })
      assert(after == history,
        s"$fmt: RETAIN 168 HOURS destroyed in-window history " +
          s"($history -> $after snapshots)")
      // the aggressive form still truncates to the head
      gs.sql(s"GRAFT VACUUM '$t' RETAIN 0 HOURS").collect()
      val head = (fmt match {
        case "iceberg" =>
          graft.formats.iceberg.IcebergMetadata.read(t,
            graft.formats.iceberg.IcebergMetadata.currentVersion(t).get)
            .snapshots.size
        case _ => graft.formats.paimon.PaimonFormat.listSnapshotIds(t).size
      })
      assert(head == 1, s"$fmt: RETAIN 0 HOURS left $head snapshots")
    }
    // HUDI: upsert + compaction supersede the base slice; the week
    // window retains it (time travel to the pre-compaction instant
    // still serves), RETAIN 0 cleans it
    import java.nio.file.{Files => JF, Paths => JP, StandardCopyOption}
    import graft.formats.hudi.{HudiLogFiles, HudiTimeline}
    val hudi = tmpDir("sqlvw_hudi")
    JF.copy(JP.get(sf("sf0.001") + "/region.parquet"),
      JP.get(hudi, "base1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val base = s"$hudi/base1.parquet"
    val region = spark.read.parquet(base)
    HudiTimeline.writeProperties(hudi, "region", "MERGE_ON_READ")
    // a REALISTIC instant (a minute ago): the widened horizon compares
    // instants as wall-clock timestamps, so a fake ancient id like "100"
    // would be (correctly) outside any retention window
    val seedInstant = HudiTimeline.InstantFormat.format(
      java.time.Instant.now().minusSeconds(60))
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta(seedInstant,
      "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(HudiTimeline.fileId(base),
        "base1.parquet", region.count(), JF.size(JP.get(base))))),
      Map.empty, Map("schema" -> region.schema.json)), hudi))
    HudiLogFiles.upsert(spark, hudi,
      region.limit(2).withColumn("r_comment",
        org.apache.spark.sql.functions.lit("updated")),
      Seq("r_regionkey"))
    require(HudiLogFiles.compact(spark, hudi) > 0, "compaction no-op")

    assert(gs.sql(s"GRAFT VACUUM '$hudi' RETAIN 168 HOURS")
      .head().getLong(0) == 0L,
      "hudi: RETAIN 168 HOURS cleaned an in-window file slice")
    assert(JF.exists(JP.get(base)),
      "hudi: in-window superseded base must survive RETAIN 168 HOURS")
    assert(gs.sql(s"GRAFT VACUUM '$hudi' RETAIN 0 HOURS")
      .head().getLong(0) >= 1L,
      "hudi: RETAIN 0 HOURS should clean the superseded slice")
    assert(!JF.exists(JP.get(base)),
      "hudi: RETAIN 0 HOURS must retire the superseded base")
  }

  test("UPDATE's WHERE boundary is quote- and paren-aware") {
    val p = new graft.sql.GraftSqlParser(null)
    // a ' where ' INSIDE the SET value must not end the SET clause
    assert(p.whereSplit("n_name = ' where x' WHERE n_nationkey = 1") ==
      Some(("n_name = ' where x'", "n_nationkey = 1")))
    assert(p.whereSplit("a = f(1) where b = 2") ==
      Some(("a = f(1)", "b = 2")))
    assert(p.whereSplit("a = 1").isEmpty)
    // end-to-end through the parser
    val t = deltaTable("sql_where_quote")
    gs.sql(s"GRAFT UPDATE '$t' SET n_name = ' where x' " +
      "WHERE n_nationkey = 0").collect()
    val got = new DeltaConversionSource(spark, t, "nation").toDataFrame
      .where("n_nationkey = 0").select("n_name").head().getString(0)
    assert(got == " where x")
  }

  test("GRAFT SHOW HISTORY lists commits across formats") {
    val t = deltaTable("sql_hist")
    gs.sql(s"GRAFT DELETE FROM '$t' WHERE n_nationkey = 0").collect()
    val hist = gs.sql(s"GRAFT SHOW HISTORY '$t'").collect()
    assert(hist.length == 2, hist.mkString(";"))
    assert(hist.map(_.getString(2)).contains("GRAFT SYNC"))
    // timestamps ordered ascending
    assert(hist.map(_.getLong(1)).toSeq == hist.map(_.getLong(1))
      .toSeq.sorted)
  }

  test("GRAFT OPTIMIZE ZORDER on Hudi: replacecommit clustering, " +
    "unabsorbed logs refuse") {
    val dataDir = tmpDir("sqlhz_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").repartition(4)
      .write.mode("overwrite").parquet(dataDir)
    val hudi = tmpDir("sqlhz_hudi")
    val src = new ParquetDirectorySource(spark, dataDir, "nation")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.hudi.HudiConversionTarget(spark, hudi)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    val r = gs.sql(s"GRAFT OPTIMIZE '$hudi' ZORDER BY (n_nationkey)").head()
    assert(r.getLong(0) == 4, r.toString)
    val instants = graft.formats.hudi.HudiTimeline.listInstants(hudi)
    assert(graft.formats.hudi.HudiTimeline.readCommit(hudi, instants.last)
      .action == "replacecommit", "clustering must land as replacecommit")
    val back = new graft.formats.hudi.HudiConversionSource(
      spark, hudi, "nation")
    assert(back.toDataFrame.count() == 25)

    // row-level logs land → a base-only clustering rewrite must refuse
    // (flip the table to MOR so the upsert writes logs)
    graft.formats.hudi.HudiTimeline.writeProperties(hudi, "nation",
      "MERGE_ON_READ")
    graft.formats.hudi.HudiLogFiles.upsert(spark, hudi,
      back.toDataFrame.limit(2).withColumn("n_name", lit("YY")),
      Seq("n_nationkey"))
    val e = intercept[Exception] {
      gs.sql(s"GRAFT OPTIMIZE '$hudi' ZORDER BY (n_nationkey)").collect()
    }
    assert(e.getMessage.contains("unabsorbed") ||
      Option(e.getCause).exists(_.getMessage.contains("unabsorbed")))
  }

  test("GRAFT OPTIMIZE on Paimon: ZORDER clusters, WHERE scopes") {
    import spark.implicits._
    val t = tmpDir("sql_popt")
    (0L until 4000L).map(i => ((i * 2654435761L) % 4000L, s"g${i % 2}"))
      .toDF("id", "grp")
      .repartition(8)
      .write.format("graft").option("tableFormat", "paimon")
      .partitionBy("grp").mode("append").save(t)
    // WHERE scopes the rewrite to one partition
    val r1 = gs.sql(s"GRAFT OPTIMIZE '$t' WHERE grp = 'g0'").head()
    assert(r1.getLong(0) >= 2 && r1.getLong(1) < r1.getLong(0))
    val snap1 = new graft.formats.paimon.PaimonConversionSource(
      spark, t, "t").currentSnapshot()
    val byPart = snap1.files.collect()
      .groupBy(_.partitionValues.head.value).view.mapValues(_.length).toMap
    assert(byPart("g0") < byPart("g1"),
      s"WHERE should compact only g0: $byPart")

    // ZORDER through SQL: whole-scope rewrite, rows unchanged
    val r2 = gs.sql(s"GRAFT OPTIMIZE '$t' ZORDER BY (id)").head()
    assert(r2.getLong(0) >= byPart("g1"))
    assert(graft.formats.delta.DeltaRead.toDataFrame(spark,
      new graft.formats.paimon.PaimonConversionSource(spark, t, "t")
        .currentSnapshot()).count() == 4000)

    // clustering visible once the target size forces multiple files:
    // per-file id bounds must narrow below the full domain
    graft.formats.paimon.PaimonCompaction.compact(spark, t,
      targetFileBytes = 2L << 10, zorderBy = Seq("id"))
    val snap2 = new graft.formats.paimon.PaimonConversionSource(
      spark, t, "t").currentSnapshot()
    val stats = snap2.files.collect().flatMap(_.columnStats)
      .filter(_.field == "id")
    val narrow = stats.count(s =>
      s.max.get.toLong - s.min.get.toLong < 3000)
    assert(stats.length > 2 && narrow > 0,
      s"no clustered bounds: ${stats.map(s => (s.min, s.max)).toSeq}")
    assert(graft.formats.delta.DeltaRead.toDataFrame(spark, snap2)
      .count() == 4000)
  }

  test("GRAFT CREATE / REFRESH BLOOM INDEX: build, guard rails, refresh") {
    val t = deltaTable("sql_bloom")
    val r = gs.sql(s"GRAFT CREATE BLOOM INDEX ON '$t' (n_name)").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, r.toString)
    // re-CREATE refuses; REFRESH on a missing column refuses
    intercept[IllegalArgumentException] {
      gs.sql(s"GRAFT CREATE BLOOM INDEX ON '$t' (n_name)").collect()
    }
    intercept[IllegalArgumentException] {
      gs.sql(s"GRAFT REFRESH BLOOM INDEX ON '$t' (n_comment)").collect()
    }
    // nothing new: refresh is a no-op
    val r2 = gs.sql(s"GRAFT REFRESH BLOOM INDEX ON '$t' (n_name)").head()
    assert(r2.getLong(0) == 0 && r2.getLong(1) == 2, r2.toString)
    // indexed point lookup still serves the row
    assert(spark.read.format("graft").load(t)
      .filter(col("n_name") === "NATION_7").count() == 1L)
  }
  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on USING graft " +
    "catalog tables, all four formats") {
    import spark.implicits._
    gs.sql("CREATE DATABASE IF NOT EXISTS tt_db")
    for (fmt <- Seq("delta", "iceberg", "hudi", "paimon")) {
      val t = tmpDir(s"sqltt_$fmt")
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "name")
        .write.format("graft").option("tableFormat", fmt)
        .mode("append").save(t)
      (10L until 25L).map(i => (i, s"v$i")).toDF("id", "name")
        .write.format("graft").option("tableFormat", fmt)
        .mode("append").save(t)
      gs.sql(s"DROP TABLE IF EXISTS tt_db.tt_$fmt")
      gs.sql(s"CREATE TABLE tt_db.tt_$fmt USING graft LOCATION '$t'")
      val verLit = fmt match {
        case "delta" => "0"
        case "iceberg" | "paimon" => "1"
        case "hudi" =>
          "'" + graft.formats.hudi.HudiTimeline.listInstants(t).head + "'"
      }
      val first = gs.sql(
        s"SELECT count(*) AS c FROM tt_db.tt_$fmt VERSION AS OF $verLit")
        .head().getLong(0)
      assert(first == 10L, s"$fmt VERSION AS OF must see the first commit")
      val head = gs.sql(s"SELECT count(*) AS c FROM tt_db.tt_$fmt")
        .head().getLong(0)
      assert(head == 25L, s"$fmt head read")
    }

    // TIMESTAMP AS OF, deterministic: delta resolves by commit-file
    // mtime — pin them, then cut between the two commits
    val dt = gs.sql("DESCRIBE TABLE EXTENDED tt_db.tt_delta")
      .filter(col("col_name") === "Location").head().getString(1)
    val log = java.nio.file.Paths.get(
      new java.net.URI(dt).getPath, "_delta_log")
    java.nio.file.Paths.get(log.toString,
      "00000000000000000000.json").toFile.setLastModified(1000000L)
    java.nio.file.Paths.get(log.toString,
      "00000000000000000001.json").toFile.setLastModified(2000000L)
    // epoch-millis string form
    assert(gs.sql("SELECT count(*) AS c FROM tt_db.tt_delta " +
      "TIMESTAMP AS OF '1500000'").head().getLong(0) == 10L)
    // timestamp-literal form (evaluates to micros; rule converts)
    assert(gs.sql("SELECT count(*) AS c FROM tt_db.tt_delta " +
      "TIMESTAMP AS OF CAST('1970-01-01 00:25:00' AS TIMESTAMP)")
      .head().getLong(0) == 10L)
    // at/after the second commit: the full table
    assert(gs.sql("SELECT count(*) AS c FROM tt_db.tt_delta " +
      "TIMESTAMP AS OF '2000000'").head().getLong(0) == 25L)

    // non-graft relations pass through to Spark's own (unsupported) path
    intercept[Exception] {
      gs.sql("SELECT * FROM range(3) VERSION AS OF 1").collect()
    }
  }

  test("SET TBLPROPERTIES delta.enableRowTracking routes to the " +
    "enablement commit; lineage serves through the reader option") {
    val d = tmpDir("sqlx_rt_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").coalesce(1)
      .write.mode("overwrite").parquet(d)
    val t = tmpDir("sqlx_rt_tbl")
    gs.sql(s"GRAFT SYNC PARQUET '$d' AS nation TO delta '$t'").collect()
    gs.sql(s"GRAFT ALTER TABLE '$t' SET TBLPROPERTIES " +
      "('delta.enableRowTracking'='true')").collect()
    val lin = spark.read.format("graft")
      .option("withRowLineage", "true").load(t)
      .select("_row_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(lin == (0L until 25L), lin.mkString(","))
    // disabling refuses — ids are a durable contract
    val e = intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$t' SET TBLPROPERTIES " +
        "('delta.enableRowTracking'='false')").collect()
    }
    assert(e.getMessage.contains("disabling row tracking"), e.getMessage)
    // non-delta refuses naming the capability
    val ice = tmpDir("sqlx_rt_ice")
    gs.sql(s"GRAFT SYNC PARQUET '$d' AS nation TO iceberg '$ice'").collect()
    val e2 = intercept[Exception] {
      gs.sql(s"GRAFT ALTER TABLE '$ice' SET TBLPROPERTIES " +
        "('delta.enableRowTracking'='true')").collect()
    }
    assert(e2.getMessage.contains("Delta capability"), e2.getMessage)
  }
}
