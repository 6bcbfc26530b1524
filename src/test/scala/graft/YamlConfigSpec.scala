package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.config.DatasetConfig

/** Reference-shaped YAML dataset config: parse fidelity and end-to-end
  * in-place conversion (metadata planes land under tableBasePath, one
  * physical table readable through every target format).
  */
class YamlConfigSpec extends SparkSuite {

  test("parses the reference RunSync config shape") {
    val cfg = DatasetConfig.parse(
      """sourceFormat: PARQUET
        |targetFormats:
        |  - DELTA
        |  - ICEBERG
        |datasets:
        |  - tableBasePath: /data/t1
        |    tableName: table_one
        |    partitionSpec: ts:DAY:yyyy-MM-dd
        |    namespace: lake
        |  - tableBasePath: /data/dir/t2
        |""".stripMargin)
    assert(cfg.sourceFormat == "PARQUET")
    assert(cfg.targetFormats == Seq("DELTA", "ICEBERG"))
    assert(cfg.datasets.size == 2)
    assert(cfg.datasets.head.tableName == "table_one")
    assert(cfg.datasets.head.partitionSpec.contains("ts:DAY:yyyy-MM-dd"))
    assert(cfg.datasets.head.namespace.contains("lake"))
    assert(cfg.datasets(1).tableName == "t2")      // derived from path
    assert(cfg.datasets(1).partitionSpec.isEmpty)
  }

  test("yaml config runs an in-place multi-target conversion") {
    val base = tmpDir("yaml_table")
    Files.copy(Paths.get(sf("sf0.001/region.parquet")),
      Paths.get(base, "data.parquet"))
    val cfgPath = Paths.get(tmpDir("yaml_cfg"), "sync.yaml")
    Files.write(cfgPath,
      s"""sourceFormat: PARQUET
         |targetFormats:
         |  - DELTA
         |  - ICEBERG
         |datasets:
         |  - tableBasePath: $base
         |    tableName: region
         |""".stripMargin.getBytes(StandardCharsets.UTF_8))

    val outcomes = RunSync.runYamlConfig(spark, cfgPath.toString)
    assert(outcomes.size == 2, outcomes.toString)
    assert(outcomes.forall(_("status") == "SUCCESS"), outcomes.toString)

    // both metadata planes coexist under the SAME base path
    assert(Files.exists(Paths.get(base, "_delta_log")))
    assert(Files.exists(Paths.get(base, "metadata", "version-hint.text")))

    // each plane reads the same rows
    val expected = spark.read.parquet(sf("sf0.001/region.parquet")).count()
    assert(new graft.formats.delta.DeltaConversionSource(
      spark, base, "region").toDataFrame.count() == expected)
    assert(new graft.formats.iceberg.IcebergConversionSource(
      spark, base, "region").toDataFrame.count() == expected)
  }
  test("hms catalogProperties route hive.metastore.uris to the real " +
    "thrift client; absent uris keep the in-memory twin") {
    val cfg = graft.config.CatalogSyncConfig.parse(
      """sourceCatalog:
        |  catalogId: "src-hms"
        |  catalogSyncClientImpl: "hms"
        |  catalogProperties:
        |    hive.metastore.uris: "thrift://127.0.0.1:1"
        |    hive.metastore.connect.retries: "1"
        |    hive.metastore.client.connect.retry.delay: "0"
        |targetCatalogs:
        |  - catalogId: "t-hms"
        |    catalogSyncClientImpl: "hms"
        |datasets: []
        |""".stripMargin)
    // the documented key is parsed through catalogProperties verbatim
    assert(graft.catalog.EmbeddedHmsCatalogClient
      .urisOf(cfg.sourceCatalog.properties)
      .contains("thrift://127.0.0.1:1"))
    // the reference's property spelling resolves too
    assert(graft.catalog.EmbeddedHmsCatalogClient
      .urisOf(Map("externalCatalog.hms.serverUrl" -> "thrift://h:9083"))
      .contains("thrift://h:9083"))

    // with uris set, buildClient reaches for the thrift WIRE (the
    // connection attempt to the refusing port is the proof it left the
    // in-memory twin); without, it stays in-memory
    val e = intercept[Exception] {
      RunCatalogSync.buildClient(spark, cfg.sourceCatalog)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + msgs(t.getCause)
    assert(msgs(e).toLowerCase.matches(
      "(?s).*(connect|connection|thrift|metastore).*"), msgs(e))
    val local = RunCatalogSync.buildClient(spark,
      cfg.catalogById("t-hms"))
    assert(local.isInstanceOf[graft.catalog.InMemoryHmsCatalogClient])
  }
}
