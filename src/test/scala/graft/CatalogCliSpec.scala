package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.catalog._
import graft.config.CatalogSyncConfig
import graft.model.TableFormats
import graft.sources.CatalogConversionSource

/** Catalog-driven sync CLI — reference RunCatalogSync.java + its
  * catalogConfig.yaml fixture: sources resolve THROUGH a catalog (or a
  * storage identifier), conversions run in place, and every target
  * registers in its target catalog under its own identifier.
  */
class CatalogCliSpec extends SparkSuite {

  test("parses the reference catalogConfig.yaml shape") {
    val cfg = CatalogSyncConfig.parse(
      """sourceCatalog:
        |  catalogId: "source-1"
        |  catalogSyncClientImpl: "hms"
        |  catalogProperties:
        |    key01: "value1"
        |targetCatalogs:
        |  - catalogId: "target-1"
        |    catalogSyncClientImpl: "glue"
        |  - catalogId: "target-2"
        |    catalogSyncClientImpl: "hms"
        |datasets:
        |  - sourceCatalogTableIdentifier:
        |      tableIdentifier:
        |        hierarchicalId: "source-database-1.source-1"
        |        partitionSpec: "cs_sold_date_sk:VALUE"
        |    targetCatalogTableIdentifiers:
        |      - catalogId: "target-1"
        |        tableFormat: "DELTA"
        |        tableIdentifier:
        |          hierarchicalId: "target-database-1.target-tableName-1"
        |  - sourceCatalogTableIdentifier:
        |      storageIdentifier:
        |        tableBasePath: /data/catalog_sales
        |        tableName: catalog_sales
        |        partitionSpec: cs_sold_date_sk:VALUE
        |        tableFormat: "HUDI"
        |    targetCatalogTableIdentifiers:
        |      - catalogId: "target-2"
        |        tableFormat: "ICEBERG"
        |        tableIdentifier:
        |          hierarchicalId: "default-catalog-2.target-database-3.t3"
        |""".stripMargin)
    assert(cfg.sourceCatalog.catalogId == "source-1")
    assert(cfg.sourceCatalog.properties("key01") == "value1")
    assert(cfg.targetCatalogs.map(_.catalogId) == Seq("target-1", "target-2"))
    assert(cfg.datasets.size == 2)
    val d1 = cfg.datasets.head
    assert(d1.source.hierarchicalId.contains("source-database-1.source-1"))
    assert(d1.source.partitionSpec.contains("cs_sold_date_sk:VALUE"))
    assert(d1.targets.head.tableFormat == "DELTA")
    val d2 = cfg.datasets(1)
    assert(d2.source.storageBasePath.contains("/data/catalog_sales"))
    assert(d2.source.storageFormat.contains("HUDI"))
    // 3-part hierarchical ids resolve to their last two segments
    assert(CatalogSyncConfig.parseHierarchicalId(
      d2.targets.head.hierarchicalId) ==
      CatalogTableIdentifier("target-database-3", "t3"))
  }

  test("catalog-resolved source converts and registers in target catalogs") {
    val base = tmpDir("catcli_table")
    Files.copy(Paths.get(sf("sf0.001/nation.parquet")),
      Paths.get(base, "data.parquet"))

    // seed the SOURCE catalog: the table resolves by name, not by path
    val sourceHms = new InMemoryHmsCatalogClient("source-cat")
    sourceHms.createDatabase("lake")
    sourceHms.createOrReplaceTable(CatalogTableDef(
      CatalogTableIdentifier("lake", "nation"), base, TableFormats.Parquet,
      columns = Seq("n_nationkey" -> "int"), partitionColumns = Nil,
      inputFormat = "", outputFormat = "", serde = "",
      properties = Map.empty))

    val glue = new InMemoryGlueCatalogClient("glue-cat")
    val hms2 = new InMemoryHmsCatalogClient("hms-cat")
    val clients = Map(
      "source-1" -> (sourceHms: CatalogSyncClient),
      "target-1" -> (glue: CatalogSyncClient),
      "target-2" -> (hms2: CatalogSyncClient))

    val cfg = CatalogSyncConfig.parse(
      s"""sourceCatalog:
         |  catalogId: "source-1"
         |  catalogSyncClientImpl: "hms"
         |targetCatalogs:
         |  - catalogId: "target-1"
         |    catalogSyncClientImpl: "glue"
         |  - catalogId: "target-2"
         |    catalogSyncClientImpl: "hms"
         |datasets:
         |  - sourceCatalogTableIdentifier:
         |      tableIdentifier:
         |        hierarchicalId: "lake.nation"
         |    targetCatalogTableIdentifiers:
         |      - catalogId: "target-1"
         |        tableFormat: "DELTA"
         |        tableIdentifier:
         |          hierarchicalId: "warehouse.nation_delta"
         |      - catalogId: "target-2"
         |        tableFormat: "ICEBERG"
         |        tableIdentifier:
         |          hierarchicalId: "warehouse.nation_ice"
         |""".stripMargin)

    val out = RunCatalogSync.run(spark, cfg, clients)
    assert(out.size == 2, out.toString)
    assert(out.forall(_("status") == "SUCCESS"), out.toString)

    // both metadata planes landed in place under the catalog's location
    assert(Files.exists(Paths.get(base, "_delta_log")))
    assert(Files.exists(Paths.get(base, "metadata", "version-hint.text")))

    // targets registered under their own identifiers, format contracts intact
    val delta = glue.getTable(
      CatalogTableIdentifier("warehouse", "nation_delta")).get
    assert(delta.location == base)
    assert(delta.properties("spark.sql.sources.provider") == "delta")
    val ice = hms2.getTable(
      CatalogTableIdentifier("warehouse", "nation_ice")).get
    assert(ice.properties("table_type") == "ICEBERG")
    assert(ice.properties("metadata_location").contains("metadata.json"))

    // each registered entry re-resolves as a conversion source and reads
    val viaGlue = CatalogConversionSource.fromCatalogClient(spark, glue,
      CatalogTableIdentifier("warehouse", "nation_delta"))
    assert(viaGlue.sourceFormat == TableFormats.Delta)
    val n = graft.formats.delta.DeltaRead
      .toDataFrame(spark, viaGlue.currentSnapshot()).count()
    assert(n == 25, s"expected 25 nation rows, got $n")
  }

  test("storage-identifier source syncs without a source catalog lookup") {
    val base = tmpDir("catcli_storage")
    Files.copy(Paths.get(sf("sf0.001/region.parquet")),
      Paths.get(base, "data.parquet"))

    val glue = new InMemoryGlueCatalogClient("glue-cat")
    val clients = Map(
      "source-1" -> (new InMemoryHmsCatalogClient("src"): CatalogSyncClient),
      "target-1" -> (glue: CatalogSyncClient))

    val cfgPath = Paths.get(tmpDir("catcli_cfg"), "catalog.yaml")
    Files.write(cfgPath,
      s"""sourceCatalog:
         |  catalogId: "source-1"
         |  catalogSyncClientImpl: "hms"
         |targetCatalogs:
         |  - catalogId: "target-1"
         |    catalogSyncClientImpl: "glue"
         |datasets:
         |  - sourceCatalogTableIdentifier:
         |      storageIdentifier:
         |        tableBasePath: $base
         |        tableName: region
         |        tableFormat: "PARQUET"
         |    targetCatalogTableIdentifiers:
         |      - catalogId: "target-1"
         |        tableFormat: "HUDI"
         |        tableIdentifier:
         |          hierarchicalId: "warehouse.region_hudi"
         |""".stripMargin.getBytes(StandardCharsets.UTF_8))

    val out = RunCatalogSync.run(spark,
      CatalogSyncConfig.parseFile(cfgPath.toString), clients)
    assert(out.size == 1, out.toString)
    assert(out.head("status") == "SUCCESS", out.toString)
    assert(Files.exists(Paths.get(base, ".hoodie", "hoodie.properties")))
    val hudi = glue.getTable(
      CatalogTableIdentifier("warehouse", "region_hudi")).get
    assert(hudi.inputFormat.contains("HoodieParquetInputFormat"))
  }

  test("unknown target catalogId is a per-dataset error, not an abort") {
    val base = tmpDir("catcli_badcat")
    Files.copy(Paths.get(sf("sf0.001/region.parquet")),
      Paths.get(base, "data.parquet"))
    val clients = Map(
      "source-1" -> (new InMemoryHmsCatalogClient("src"): CatalogSyncClient))
    val cfg = CatalogSyncConfig.parse(
      s"""sourceCatalog:
         |  catalogId: "source-1"
         |  catalogSyncClientImpl: "hms"
         |targetCatalogs:
         |  - catalogId: "missing"
         |    catalogSyncClientImpl: "glue"
         |datasets:
         |  - sourceCatalogTableIdentifier:
         |      storageIdentifier:
         |        tableBasePath: $base
         |        tableFormat: "PARQUET"
         |    targetCatalogTableIdentifiers:
         |      - catalogId: "nope"
         |        tableFormat: "DELTA"
         |        tableIdentifier:
         |          hierarchicalId: "db.t"
         |""".stripMargin)
    val out = RunCatalogSync.run(spark, cfg, clients)
    assert(out.size == 1)
    assert(out.head("status") == "ERROR")
    assert(out.head("error").toString.contains("nope"))
  }
}
