package graft

import graft.catalog._
import graft.model.TableFormats
import graft.sources.{CatalogConversionSource, ParquetDirectorySource}
import graft.sync.TableFormatSync

/** The catalog sink contract against a REAL Hive metastore (embedded
  * Derby-backed ObjectStore — the persistence layer a production HMS
  * runs): registration, re-resolution, CAS create, refresh identity,
  * divergence replace, and explicit partition add/drop, all through real
  * thrift `Table`/`StorageDescriptor`/`Partition` objects. Reference:
  * HMSCatalogSyncClient.java against a live metastore.
  */
class EmbeddedHmsSpec extends SparkSuite {

  private lazy val hms = EmbeddedHmsCatalogClient.client

  test("conversions register in the embedded metastore and re-resolve") {
    val deltaDir = tmpDir("ehms_delta")
    val iceDir = tmpDir("ehms_ice")
    val src = new ParquetDirectorySource(
      spark, sf("sf0.001") + "/customer.parquet", "customer")
    val snap = src.currentSnapshot()
    val out = TableFormatSync.syncSnapshot(Seq(
      new graft.formats.delta.DeltaConversionTarget(spark, deltaDir),
      new graft.formats.iceberg.IcebergConversionTarget(spark, iceDir)),
      snap, src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    val regs = Seq(
      (TableFormats.Delta, deltaDir, "cust_delta", None),
      (TableFormats.Iceberg, iceDir, "cust_ice",
        Some(s"$iceDir/metadata/v1.metadata.json")))
    regs.foreach { case (fmt, dir, name, metaLoc) =>
      val id = CatalogTableIdentifier("ehms_lake", name)
      val outcomes = CatalogOrchestrator.syncTable(
        Seq(hms), id, snap.table.copy(basePath = dir), fmt, metaLoc)
      assert(outcomes.forall(_.status == "SUCCESS"), outcomes.toString)
    }

    // the stored thrift entry round-trips the storage descriptor intact
    val ice = hms.getTable(CatalogTableIdentifier("ehms_lake", "cust_ice")).get
    assert(ice.tableFormat == TableFormats.Iceberg)
    assert(ice.properties("table_type") == "ICEBERG")
    assert(ice.properties.contains("metadata_location"))
    assert(ice.serde == "org.apache.iceberg.mr.hive.HiveIcebergSerDe")
    val delta =
      hms.getTable(CatalogTableIdentifier("ehms_lake", "cust_delta")).get
    assert(delta.properties("spark.sql.sources.provider") == "delta")
    assert(delta.columns.exists { case (n, t) =>
      n == "c_custkey" && t == "bigint" })

    // re-resolution through the REAL metastore entry reads identical rows
    val expected =
      spark.read.parquet(sf("sf0.001") + "/customer.parquet").count()
    regs.foreach { case (fmt, _, name, _) =>
      val resolved = CatalogConversionSource.fromCatalogClient(
        spark, hms, CatalogTableIdentifier("ehms_lake", name))
      assert(resolved.sourceFormat == fmt)
      val n = graft.formats.delta.DeltaRead
        .toDataFrame(spark, resolved.currentSnapshot()).count()
      assert(n == expected, s"$name: $n != $expected")
    }
  }

  test("create is CAS; refresh keeps identity; divergence replaces") {
    val deltaDir = tmpDir("ehms_sem")
    val src = new ParquetDirectorySource(
      spark, sf("sf0.001") + "/nation.parquet", "nation")
    val snap = src.currentSnapshot()
    assert(TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, deltaDir)),
      snap, src.sourceFormat).forall(_.status == "SUCCESS"))
    val id = CatalogTableIdentifier("ehms_sem", "t1")
    val t = CatalogTableBuilders.forTable(id,
      snap.table.copy(basePath = deltaDir), TableFormats.Delta)
    hms.createDatabase("ehms_sem")
    hms.createTable(t)
    // metastore-level AlreadyExists surfaces as the SPI's CAS failure
    intercept[IllegalStateException](hms.createTable(t))

    // same location+format → orchestrator refreshes in place
    val out1 = CatalogOrchestrator.syncTable(Seq(hms), id,
      snap.table.copy(basePath = deltaDir), TableFormats.Delta)
    assert(out1.head.status == "SUCCESS", out1.head)
    // refreshed properties land in the stored entry
    assert(hms.getTable(id).get.location == deltaDir)

    // diverged location → wholesale replace (drop + create)
    val otherDir = tmpDir("ehms_sem_other")
    val out2 = CatalogOrchestrator.syncTable(Seq(hms), id,
      snap.table.copy(basePath = otherDir), TableFormats.Delta)
    assert(out2.head.status == "SUCCESS", out2.head)
    assert(hms.getTable(id).get.location == otherDir)
  }

  test("partition registration: explicit diff, batch semantics, no-ops") {
    val id = CatalogTableIdentifier("ehms_parts", "events")
    hms.createDatabase("ehms_parts")
    hms.createOrReplaceTable(CatalogTableDef(id, "/x", "DELTA",
      Seq("v" -> "double"), Seq("event_type" -> "string"),
      "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
      "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat",
      "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe",
      Map("EXTERNAL" -> "TRUE")))
    hms.addPartitions(id, Seq(
      CatalogPartition(Seq("click"), "/x/event_type=click"),
      CatalogPartition(Seq("view"), "/x/event_type=view")))
    // duplicate add is a per-item no-op (ifNotExists), location unchanged
    hms.addPartitions(id, Seq(
      CatalogPartition(Seq("click"), "/x/event_type=CHANGED"),
      CatalogPartition(Seq("purchase"), "/x/event_type=purchase")))
    val parts = hms.listPartitions(id)
    assert(parts.map(_.values.head) == Seq("click", "purchase", "view"))
    assert(parts.find(_.values.head == "click").get.location ==
      "/x/event_type=click")
    // missing drop is a no-op; present drop lands
    hms.dropPartitions(id, Seq(Seq("view"), Seq("missing")))
    assert(hms.listPartitions(id).map(_.values.head) ==
      Seq("click", "purchase"))

    // the orchestrator's desired-set diff drives the same calls
    CatalogOrchestrator.syncTable(Seq(hms), id,
      graft.model.TableDescriptor("events", "DELTA", "/x",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))),
        Seq(graft.model.PartitionFieldSpec("event_type", "VALUE")),
        graft.model.Layout.HivePartitioned, 0L),
      TableFormats.Delta, None, Seq(
        CatalogPartition(Seq("click"), "/x/event_type=click"),
        CatalogPartition(Seq("scroll"), "/x/event_type=scroll")))
    assert(hms.listPartitions(id).map(_.values.head) ==
      Seq("click", "scroll"))
  }
}
