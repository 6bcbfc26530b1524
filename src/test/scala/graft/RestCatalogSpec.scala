package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** Iceberg REST catalog: a REAL loopback HTTP round-trip — the client
  * speaks the public REST catalog dialect over an actual TCP socket to
  * the in-process spec-shaped server. This is the catalog plane's first
  * live-wire exercise (the Glue/HMS clients run in-process because no
  * such endpoint exists in this environment).
  */
class RestCatalogSpec extends SparkSuite {

  private def syncIceberg(prefix: String): (String, Long) = {
    val table = tmpDir(prefix)
    val src = new ParquetDirectorySource(spark,
      s"${sf("sf0.001")}/nation.parquet", "nation")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, table)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val v = graft.formats.iceberg.IcebergMetadata.currentVersion(table).get
    (table, v)
  }

  test("register / load / refresh / replace / drop over real HTTP") {
    val server = new IcebergRestCatalogServer().start()
    try {
      val client = new IcebergRestCatalogClient(server.baseUri)
      val id = CatalogTableIdentifier("analytics", "nation_rest")

      // namespace lifecycle
      assert(!client.hasDatabase("analytics"))
      client.createDatabase("analytics")
      assert(client.hasDatabase("analytics"))
      client.createDatabase("analytics") // ensure-style: 409 tolerated

      // register an externally-written (graft filesystem) table
      val (table, v1) = syncIceberg("rest_ice")
      val metaLoc1 = graft.formats.iceberg.IcebergMetadata
        .metadataFile(table, v1)
      assert(client.getTable(id).isEmpty)
      val desc = new graft.formats.iceberg.IcebergConversionSource(
        spark, table, "nation").currentTable()
      val outcomes = CatalogOrchestrator.syncTable(Seq(client), id, desc,
        graft.model.TableFormats.Iceberg, Some(metaLoc1))
      assert(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))

      // load: the catalog answer carries the metadata-location; reading
      // THROUGH it serves the table
      val loaded = client.getTable(id).get
      assert(loaded.properties("metadata_location") == metaLoc1)
      val served = new graft.formats.iceberg.IcebergConversionSource(
        spark, table, "nation").toDataFrame
      assert(served.count() ==
        spark.read.parquet(s"${sf("sf0.001")}/nation.parquet").count())

      // double-create refuses (catalog stays the authority)
      val e = intercept[IllegalStateException] {
        client.createTable(CatalogTableBuilders.forTable(id.normalized,
          desc, graft.model.TableFormats.Iceberg, Some(metaLoc1)))
      }
      assert(e.getMessage.contains("409"), e.getMessage)

      // second sync advances the metadata pointer; orchestrator routes
      // through refreshTable → register overwrite=true
      val extra = tmpDir("rest_ice_extra")
      spark.read.parquet(s"${sf("sf0.001")}/region.parquet")
        .write.mode("overwrite").parquet(extra)
      graft.formats.iceberg.IcebergDeletes.appendDataFiles(
        spark, table, extra)
      val v2 = graft.formats.iceberg.IcebergMetadata
        .currentVersion(table).get
      assert(v2 > v1)
      val metaLoc2 = graft.formats.iceberg.IcebergMetadata
        .metadataFile(table, v2)
      val outcomes2 = CatalogOrchestrator.syncTable(Seq(client), id, desc,
        graft.model.TableFormats.Iceberg, Some(metaLoc2))
      assert(outcomes2.forall(_.status == "SUCCESS"), outcomes2.mkString(";"))
      assert(client.getTable(id).get
        .properties("metadata_location") == metaLoc2)

      // drop; load sees 404 → None
      client.dropTable(id)
      assert(client.getTable(id).isEmpty)
      client.dropTable(id) // idempotent: 404 tolerated

      // the whole exchange really crossed the wire
      assert(server.requestCount >= 10, s"only ${server.requestCount}")
    } finally server.stop()
  }

  test("the unified reader resolves a table BY NAME over REST, and " +
    "special-character identifiers survive the wire") {
    val server = new IcebergRestCatalogServer().start()
    try {
      val client = new IcebergRestCatalogClient(server.baseUri)
      // a namespace with a space and a dash-bearing table name: the
      // client percent-encodes segments instead of mangling them through
      // Glue's alphabet, and the server decodes them back
      val id = CatalogTableIdentifier("prod data", "nation-v2")
      client.createDatabase("prod data")
      assert(client.hasDatabase("prod data"))
      val (table, v1) = syncIceberg("rest_byname")
      val metaLoc = graft.formats.iceberg.IcebergMetadata
        .metadataFile(table, v1)
      val desc = new graft.formats.iceberg.IcebergConversionSource(
        spark, table, "nation").currentTable()
      val outcomes = CatalogOrchestrator.syncTable(Seq(client), id, desc,
        graft.model.TableFormats.Iceberg, Some(metaLoc))
      assert(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
      assert(client.getTable(id).get
        .properties("metadata_location") == metaLoc)

      // spark.read.format("graft") with NO path: restCatalog + table
      // resolve the location over the wire
      val before = server.requestCount
      val df = spark.read.format("graft")
        .option("restCatalog", server.baseUri)
        .option("table", "prod data.nation-v2")
        .load()
      assert(server.requestCount > before, "resolution must hit the wire")
      val expected = spark.read
        .parquet(s"${sf("sf0.001")}/nation.parquet")
        .select("n_nationkey").collect().map(_.getAs[Number](0).longValue)
      assert(df.select("n_nationkey").collect()
        .map(_.getAs[Number](0).longValue).sorted.toSeq ==
        expected.sorted.toSeq)

      // a missing table names itself in the failure
      val e = intercept[NoSuchElementException] {
        spark.read.format("graft")
          .option("restCatalog", server.baseUri)
          .option("table", "prod data.ghost").load()
      }
      assert(e.getMessage.contains("ghost"), e.getMessage)

      // the r14 double-decode bug class: identifiers containing '+' and
      // a literal '%' must survive — the server splits the RAW path and
      // decodes each segment exactly once (a second decode eats '+' as
      // space and throws 500 on '%')
      val hard = CatalogTableIdentifier("a+b", "pct%t")
      client.createDatabase("a+b")
      assert(client.hasDatabase("a+b"))
      assert(!client.hasDatabase("a b"),
        "'+' must not decode to a space server-side")
      val out2 = CatalogOrchestrator.syncTable(Seq(client), hard, desc,
        graft.model.TableFormats.Iceberg, Some(metaLoc))
      assert(out2.forall(_.status == "SUCCESS"), out2.mkString(";"))
      assert(client.getTable(hard).get
        .properties("metadata_location") == metaLoc)
      client.dropTable(hard)
      assert(client.getTable(hard).isEmpty)
    } finally server.stop()
  }

  test("unknown namespace and malformed registration fail spec-shaped") {
    val server = new IcebergRestCatalogServer().start()
    try {
      val client = new IcebergRestCatalogClient(server.baseUri)
      val id = CatalogTableIdentifier("ghost", "t")
      // register into a missing namespace → 404 with the spec's error
      // envelope surfaced in the exception
      val e = intercept[IllegalStateException] {
        client.createTable(CatalogTableDef(id, "loc", "ICEBERG", Nil, Nil,
          "", "", "", Map("metadata_location" -> "/nope.json")))
      }
      assert(e.getMessage.contains("404") &&
        e.getMessage.contains("NoSuchNamespaceException"), e.getMessage)
      // a def without metadata_location refuses client-side
      client.createDatabase("ghost")
      val e2 = intercept[IllegalArgumentException] {
        client.createTable(CatalogTableDef(id, "loc", "ICEBERG", Nil, Nil,
          "", "", "", Map.empty))
      }
      assert(e2.getMessage.contains("metadata_location"), e2.getMessage)
    } finally server.stop()
  }
}
