package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.model.TableFormats
import graft.sources.{CatalogConversionSource, ParquetDirectorySource}
import graft.sync.TableFormatSync

/** Catalog sink SPI: conversions end in a catalog registration
  * (reference GlueCatalogSyncClient / HMSCatalogSyncClient semantics),
  * and the registered entry must re-resolve as a conversion source.
  */
class CatalogSinkSpec extends SparkSuite {

  private def convertAll(): (String, String, String, graft.model.TableSnapshot) = {
    val deltaDir = tmpDir("cat_delta")
    val iceDir = tmpDir("cat_ice")
    val hudiDir = tmpDir("cat_hudi")
    val src = new ParquetDirectorySource(
      spark, sf("sf0.001") + "/customer.parquet", "customer")
    val snap = src.currentSnapshot()
    val out = TableFormatSync.syncSnapshot(Seq(
      new graft.formats.delta.DeltaConversionTarget(spark, deltaDir),
      new graft.formats.iceberg.IcebergConversionTarget(spark, iceDir),
      new graft.formats.hudi.HudiConversionTarget(spark, hudiDir)),
      snap, src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    (deltaDir, iceDir, hudiDir, snap)
  }

  test("all three conversions register in the HMS-shaped catalog and re-resolve") {
    val (deltaDir, iceDir, hudiDir, snap) = convertAll()
    val hms = new InMemoryHmsCatalogClient()
    val regs = Seq(
      (TableFormats.Delta, deltaDir, "cust_delta"),
      (TableFormats.Iceberg, iceDir, "cust_ice"),
      (TableFormats.Hudi, hudiDir, "cust_hudi"))
    regs.foreach { case (fmt, dir, name) =>
      val id = CatalogTableIdentifier("lake", name)
      val table = snap.table.copy(basePath = dir)
      val metaLoc = if (fmt == TableFormats.Iceberg)
        Some(s"$dir/metadata/v1.metadata.json") else None
      val outcomes = CatalogOrchestrator.syncTable(
        Seq(hms), id, table, fmt, metaLoc)
      assert(outcomes.forall(_.status == "SUCCESS"), outcomes.toString)
    }

    // storage descriptors carry each format's public catalog contract
    val ice = hms.getTable(CatalogTableIdentifier("lake", "cust_ice")).get
    assert(ice.properties("table_type") == "ICEBERG")
    assert(ice.properties.contains("metadata_location"))
    val delta = hms.getTable(CatalogTableIdentifier("lake", "cust_delta")).get
    assert(delta.properties("spark.sql.sources.provider") == "delta")
    val hudi = hms.getTable(CatalogTableIdentifier("lake", "cust_hudi")).get
    assert(hudi.inputFormat.contains("HoodieParquetInputFormat"))
    // schema translated to hive types
    assert(delta.columns.exists { case (n, t) =>
      n == "c_acctbal" && t == "double" })
    assert(delta.columns.exists { case (n, t) =>
      n == "c_custkey" && t == "bigint" })

    // each registered entry re-resolves as a conversion source of the
    // right format THROUGH the catalog client, reading identical row counts
    val expected = spark.read.parquet(sf("sf0.001") + "/customer.parquet").count()
    regs.foreach { case (fmt, dir, name) =>
      val resolved = CatalogConversionSource.fromCatalogClient(
        spark, hms, CatalogTableIdentifier("lake", name))
      assert(resolved.sourceFormat == fmt, s"$name detected ${resolved.sourceFormat}")
      val n = graft.formats.delta.DeltaRead
        .toDataFrame(spark, resolved.currentSnapshot()).count()
      assert(n == expected, s"$name: $n != $expected")
    }
  }

  test("create/refresh/replace semantics match the metastore contract") {
    val hms = new InMemoryHmsCatalogClient()
    val id = CatalogTableIdentifier("db1", "t1")
    val (deltaDir, _, _, snap) = convertAll()
    val t = CatalogTableBuilders.forTable(id,
      snap.table.copy(basePath = deltaDir), TableFormats.Delta)
    hms.createDatabase("db1")
    hms.createTable(t)
    intercept[IllegalStateException](hms.createTable(t))      // create is CAS
    // same location+format → refresh keeps identity
    val out1 = CatalogOrchestrator.syncTable(Seq(hms), id,
      snap.table.copy(basePath = deltaDir), TableFormats.Delta)
    assert(out1.head.status == "SUCCESS")
    // diverged location → replaced wholesale
    val otherDir = tmpDir("cat_other")
    val out2 = CatalogOrchestrator.syncTable(Seq(hms), id,
      snap.table.copy(basePath = otherDir), TableFormats.Delta)
    assert(out2.head.status == "SUCCESS")
    assert(hms.getTable(id).get.location == otherDir)
  }

  test("partition registration is an explicit add/drop diff") {
    val hms = new InMemoryHmsCatalogClient()
    val id = CatalogTableIdentifier("db2", "events")
    hms.createDatabase("db2")
    hms.createOrReplaceTable(CatalogTableDef(id, "/x", "DELTA",
      Seq("v" -> "double"), Seq("event_type" -> "string"),
      "", "", "", Map.empty))
    hms.addPartitions(id, Seq(
      CatalogPartition(Seq("click"), "/x/event_type=click"),
      CatalogPartition(Seq("view"), "/x/event_type=view")))
    // desired set drops view, adds purchase — diff must do exactly that
    val desired = Seq(
      CatalogPartition(Seq("click"), "/x/event_type=click"),
      CatalogPartition(Seq("purchase"), "/x/event_type=purchase"))
    CatalogOrchestrator.syncTable(Seq(hms), id,
      graft.model.TableDescriptor("events", "DELTA", "/x",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))),
        Seq(graft.model.PartitionFieldSpec("event_type", "VALUE")),
        graft.model.Layout.HivePartitioned, 0L),
      TableFormats.Delta, None, desired)
    assert(hms.listPartitions(id).map(_.values.head).sorted ==
      Seq("click", "purchase"))
  }

  test("10k partitions register in bounded batches with per-batch isolation") {
    // records every batch size; fails the 13th add call once, to prove the
    // remaining batches still land and the failure surfaces aggregated
    class RecordingGlue extends InMemoryGlueCatalogClient {
      val addSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
      val dropSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
      var failNthAdd: Int = -1
      override def addPartitions(id: CatalogTableIdentifier,
          parts: Seq[CatalogPartition]): Unit = {
        addSizes += parts.size
        if (addSizes.size == failNthAdd)
          throw new RuntimeException("simulated Glue throttle")
        super.addPartitions(id, parts)
      }
      override def dropPartitions(id: CatalogTableIdentifier,
          values: Seq[Seq[String]]): Unit = {
        dropSizes += values.size
        super.dropPartitions(id, values)
      }
    }
    val glue = new RecordingGlue
    glue.failNthAdd = 13
    val id = CatalogTableIdentifier("dbbig", "events")
    val desired = (0 until 10000).map(i =>
      CatalogPartition(Seq(s"k$i"), s"/x/p=k$i"))
    val table = graft.model.TableDescriptor("events", "DELTA", "/x",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))),
      Seq(graft.model.PartitionFieldSpec("p", "VALUE")),
      graft.model.Layout.HivePartitioned, 0L)
    val out = CatalogOrchestrator.syncTable(Seq(glue), id, table,
      TableFormats.Delta, None, desired)
    // the failed batch marks the catalog outcome ERROR with the batch named
    assert(out.head.status == "ERROR" &&
      out.head.error.exists(_.contains("add batch 12")), out.head)
    // every batch obeyed the Glue cap and all but the failed one landed
    assert(glue.addSizes.size == 100 && glue.addSizes.forall(_ == 100))
    assert(glue.listPartitions(id).size == 9900)

    // a clean re-sync repairs the hole: only the missing batch re-adds
    glue.failNthAdd = -1
    glue.addSizes.clear()
    val out2 = CatalogOrchestrator.syncTable(Seq(glue), id, table,
      TableFormats.Delta, None, desired)
    assert(out2.head.status == "SUCCESS", out2.head)
    assert(glue.addSizes.sum == 100, glue.addSizes)
    assert(glue.listPartitions(id).size == 10000)

    // shrink the desired set → drops are batched too
    val out3 = CatalogOrchestrator.syncTable(Seq(glue), id, table,
      TableFormats.Delta, None, desired.take(150))
    assert(out3.head.status == "SUCCESS", out3.head)
    assert(glue.dropSizes.forall(_ <= 100))
    assert(glue.listPartitions(id).size == 150)
  }

  test("hive-partitioned snapshot yields one catalog partition per directory") {
    val dataDir = tmpDir("cat_part_data")
    graft.queries.Tables.normalizeTs(
        spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .repartition(col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dataDir)
    val src = new ParquetDirectorySource(spark, dataDir, "events")
    val parts = CatalogOrchestrator.partitionsOf(spark, src.currentSnapshot())
    assert(parts.nonEmpty)
    assert(parts.map(_.values.head).distinct.size == parts.size)
    assert(parts.forall(p => p.location.contains(s"event_type=${p.values.head}")))
  }

  test("glue-shaped catalog: versioned updates, batch partitions, re-resolution") {
    val (deltaDir, _, _, snap) = convertAll()
    val glue = new InMemoryGlueCatalogClient(maxVersions = 3)
    val hms = new InMemoryHmsCatalogClient()
    val id = CatalogTableIdentifier("lake", "cust_glue")
    // one orchestration pass fans out to BOTH catalog flavors
    val out = CatalogOrchestrator.syncTable(Seq(glue, hms), id,
      snap.table.copy(basePath = deltaDir), TableFormats.Delta)
    assert(out.forall(_.status == "SUCCESS"), out.toString)
    val t = glue.getTable(id).get
    assert(t.properties("classification") == "delta")
    assert(t.properties("table_type_glue") == "EXTERNAL_TABLE")
    // create is CAS, like Glue's AlreadyExistsException
    intercept[IllegalStateException](glue.createTable(t))
    // each re-sync = UpdateTable = a new version; history pruned to max
    (1 to 4).foreach { i =>
      CatalogOrchestrator.syncTable(Seq(glue), id,
        snap.table.copy(basePath = deltaDir), TableFormats.Delta)
    }
    assert(glue.tableVersions(id).size == 3)      // pruned at maxVersions
    // batch partition add: duplicate entries are per-item no-ops
    glue.addPartitions(id, Seq(
      CatalogPartition(Seq("a"), "/x/p=a"), CatalogPartition(Seq("b"), "/x/p=b")))
    glue.addPartitions(id, Seq(
      CatalogPartition(Seq("a"), "/x/p=CHANGED"), CatalogPartition(Seq("c"), "/x/p=c")))
    val parts = glue.listPartitions(id)
    assert(parts.map(_.values.head) == Seq("a", "b", "c"))
    assert(parts.find(_.values.head == "a").get.location == "/x/p=a")
    glue.dropPartitions(id, Seq(Seq("b"), Seq("missing")))
    assert(glue.listPartitions(id).map(_.values.head) == Seq("a", "c"))
    // the registered entry re-resolves as a conversion source of the right
    // format, reading identical row counts
    val resolved = CatalogConversionSource.fromCatalogClient(spark, glue, id)
    assert(resolved.sourceFormat == TableFormats.Delta)
    val n = graft.formats.delta.DeltaRead
      .toDataFrame(spark, resolved.currentSnapshot()).count()
    assert(n == spark.read.parquet(sf("sf0.001") + "/customer.parquet").count())
    // divergence replace resets version history (DeleteTable + CreateTable)
    val otherDir = tmpDir("cat_glue_other")
    CatalogOrchestrator.syncTable(Seq(glue), id,
      snap.table.copy(basePath = otherDir), TableFormats.Delta)
    assert(glue.tableVersions(id).size == 1)
    assert(glue.getTable(id).get.location == otherDir)
  }

  test("session-catalog partitioned tables read through the metadata plane") {
    // partitioned entries also register USING graft — a parquet entry
    // would read files the table format has already removed, and its
    // catalog partitions would go stale
    val dataDir = tmpDir("cat_sp_data")
    val deltaDir = tmpDir("cat_sp_delta")
    graft.queries.Tables.normalizeTs(
        spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .repartition(col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dataDir)
    val src = new ParquetDirectorySource(spark, dataDir, "events")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, deltaDir)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val client = new SparkSessionCatalogClient(spark)
    val id = CatalogTableIdentifier("graft_cat_part", "events")
    val reg = CatalogOrchestrator.syncTable(Seq(client), id,
      src.currentTable().copy(basePath = deltaDir), TableFormats.Delta,
      partitions = CatalogOrchestrator.partitionsOf(spark, src.currentSnapshot()))
    assert(reg.forall(_.status == "SUCCESS"), reg.toString)
    // partition-filtered SQL by name matches the source of truth
    val byName = spark.sql(
      "SELECT count(*) FROM graft_cat_part.events WHERE event_type = 'click'")
      .head().getLong(0)
    val direct = spark.read.parquet(dataDir)
      .filter(col("event_type") === "click").count()
    assert(byName == direct && byName > 0)
    // listPartitions reflects the metadata plane, not catalog entries
    val parts = client.listPartitions(id)
    assert(parts.map(_.values.head).sorted ==
      spark.read.parquet(dataDir).select("event_type").distinct()
        .collect().map(_.getString(0)).toSeq.sorted)
    // a value with an embedded quote must not break property DDL
    client.refreshTable(client.getTable(id).get.copy(
      properties = Map("note" -> "it's quoted")))
    assert(client.getTable(id).get.properties("note") == "it's quoted")
    client.dropTable(id)
  }

  test("session-catalog client implements the same SPI") {
    val (deltaDir, _, _, snap) = convertAll()
    val client = new SparkSessionCatalogClient(spark)
    val id = CatalogTableIdentifier("graft_cat_test", "cust")
    // flat tables register USING graft: the entry points at the DELTA
    // metadata dir (which holds only the log — conversions are zero-copy)
    // and reads resolve through the metadata plane to the original files
    val outcomes = CatalogOrchestrator.syncTable(Seq(client), id,
      snap.table.copy(basePath = deltaDir), TableFormats.Delta)
    assert(outcomes.forall(_.status == "SUCCESS"), outcomes.toString)
    val back = client.getTable(id)
    assert(back.isDefined)
    assert(back.get.properties.get("graft.format").contains("DELTA"))
    // queryable by name through Spark SQL
    val n = spark.sql(s"SELECT count(*) FROM graft_cat_test.cust").head().getLong(0)
    assert(n == spark.read.parquet(sf("sf0.001") + "/customer.parquet").count())
    client.dropTable(id)
    assert(client.getTable(id).isEmpty)
  }
}
