package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Reference-compatible catalog-sync YAML — the exact shape
  * xtable-utilities RunCatalogSync.java:123-133 consumes
  * (test fixture: xtable-utilities/src/test/resources/catalogConfig.yaml):
  *
  * {{{
  * sourceCatalog:
  *   catalogId: "source-1"
  *   catalogSyncClientImpl: "hms"          # impl key or class name
  *   catalogProperties: { ... }
  * targetCatalogs:
  *   - catalogId: "target-1"
  *     catalogSyncClientImpl: "glue"
  * datasets:
  *   - sourceCatalogTableIdentifier:
  *       tableIdentifier:
  *         hierarchicalId: "db.table"      # resolved through sourceCatalog
  *         partitionSpec: "col:VALUE"      # optional DSL
  *     targetCatalogTableIdentifiers:
  *       - catalogId: "target-1"
  *         tableFormat: "DELTA"
  *         tableIdentifier: { hierarchicalId: "db2.t2" }
  *   - sourceCatalogTableIdentifier:
  *       storageIdentifier:                # catalog-less source
  *         tableBasePath: /data/t
  *         tableName: t
  *         tableFormat: "HUDI"
  *         partitionSpec: "col:VALUE"
  *     targetCatalogTableIdentifiers: [ ... ]
  * }}}
  */
case class CatalogEntryConfig(
    catalogId: String,
    impl: String,
    properties: Map[String, String])

/** Either a catalog-resolved source (`hierarchicalId`) or a direct
  * storage-path source — reference SourceTableIdentifier's two arms.
  */
case class SourceTableIdentifier(
    hierarchicalId: Option[String],
    partitionSpec: Option[String],
    storageBasePath: Option[String],
    storageTableName: Option[String],
    storageFormat: Option[String])

case class TargetTableIdentifier(
    catalogId: String,
    tableFormat: String,
    hierarchicalId: String)

case class CatalogDataset(
    source: SourceTableIdentifier,
    targets: Seq[TargetTableIdentifier])

case class CatalogSyncConfig(
    sourceCatalog: CatalogEntryConfig,
    targetCatalogs: Seq[CatalogEntryConfig],
    datasets: Seq[CatalogDataset]) {
  def catalogById: Map[String, CatalogEntryConfig] =
    (sourceCatalog +: targetCatalogs).map(c => c.catalogId -> c).toMap
}

object CatalogSyncConfig {

  private val yaml = new ObjectMapper(new YAMLFactory())

  private def textOpt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def parseCatalog(n: JsonNode): CatalogEntryConfig = {
    import scala.jdk.CollectionConverters._
    CatalogEntryConfig(
      n.get("catalogId").asText,
      // the reference names a Java impl class; graft resolves well-known
      // keys (hms/glue/session) or a class name via the client factory
      textOpt(n, "catalogSyncClientImpl")
        .orElse(textOpt(n, "catalogConversionSourceImpl"))
        .getOrElse("hms"),
      Option(n.get("catalogProperties")).map { p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
      }.getOrElse(Map.empty))
  }

  def parse(content: String): CatalogSyncConfig = {
    import scala.jdk.CollectionConverters._
    val n = yaml.readTree(content)
    require(n.hasNonNull("sourceCatalog"), "config needs sourceCatalog")
    require(n.hasNonNull("targetCatalogs"), "config needs targetCatalogs")
    require(n.hasNonNull("datasets"), "config needs datasets")
    CatalogSyncConfig(
      parseCatalog(n.get("sourceCatalog")),
      n.get("targetCatalogs").elements().asScala.map(parseCatalog).toSeq,
      n.get("datasets").elements().asScala.map { d =>
        val s = d.get("sourceCatalogTableIdentifier")
        val tid = Option(s.get("tableIdentifier"))
        val sid = Option(s.get("storageIdentifier"))
        require(tid.isDefined || sid.isDefined,
          "dataset needs tableIdentifier or storageIdentifier")
        CatalogDataset(
          SourceTableIdentifier(
            tid.flatMap(textOpt(_, "hierarchicalId")),
            tid.flatMap(textOpt(_, "partitionSpec"))
              .orElse(sid.flatMap(textOpt(_, "partitionSpec"))),
            sid.flatMap(textOpt(_, "tableBasePath")),
            sid.flatMap(textOpt(_, "tableName")),
            sid.flatMap(textOpt(_, "tableFormat"))),
          d.get("targetCatalogTableIdentifiers").elements().asScala.map { t =>
            def req(field: String): String = textOpt(t, field).getOrElse(
              throw new IllegalArgumentException(
                s"target entry missing '$field' (dataset ${s.toString.take(80)})"))
            TargetTableIdentifier(
              req("catalogId"),
              req("tableFormat").toUpperCase,
              Option(t.get("tableIdentifier"))
                .flatMap(textOpt(_, "hierarchicalId")).getOrElse(
                  throw new IllegalArgumentException(
                    "target entry missing tableIdentifier.hierarchicalId" +
                      s" (catalogId ${textOpt(t, "catalogId").getOrElse("?")})")))
          }.toSeq)
      }.toSeq)
  }

  def parseFile(path: String): CatalogSyncConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Last two segments of a hierarchical id — the reference accepts both
    * `database.table` and `catalog.database.table`
    * (ThreePartHierarchicalTableIdentifier).
    */
  def parseHierarchicalId(id: String): graft.catalog.CatalogTableIdentifier = {
    val parts = id.split('.')
    require(parts.length >= 2, s"hierarchicalId needs database.table: $id")
    graft.catalog.CatalogTableIdentifier(
      parts(parts.length - 2), parts(parts.length - 1))
  }
}
