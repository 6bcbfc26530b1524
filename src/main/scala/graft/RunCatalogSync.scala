package graft

import org.apache.spark.sql.SparkSession

import graft.catalog._
import graft.config.{CatalogEntryConfig, CatalogSyncConfig}
import graft.model.TableFormats
import graft.sources.{CatalogConversionSource, ParquetDirectorySource}
import graft.spi.{ConversionSource, SyncMode}
import graft.sync.ConversionController
import graft.util.Jsons

/** Catalog-driven sync CLI — reference xtable-utilities
  * RunCatalogSync.java:113-196: one YAML names a source catalog, N target
  * catalogs, and datasets whose source resolves THROUGH the catalog (or a
  * direct storage path); each dataset is converted in place to every target
  * format and then registered in each target catalog under its own
  * identifier.
  *
  * Usage: runMain graft.RunCatalogSync <catalogConfig.yaml>
  */
object RunCatalogSync {

  /** Map a config impl key/class to a client. Well-known keys cover the
    * in-process Glue/HMS-semantics clients and the Spark session catalog;
    * anything else is loaded reflectively as a
    * [[graft.catalog.CatalogSyncClient]] with a (catalogName) constructor —
    * the reference's pluggable `catalogSyncClientImpl` contract.
    */
  def buildClient(spark: SparkSession, cfg: CatalogEntryConfig)
      : CatalogSyncClient = {
    // exact well-known keys only: a class name (contains '.') must reach
    // Class.forName — substring matching would shadow e.g.
    // com.example.HiveSyncClient with the in-memory stub
    cfg.impl.toLowerCase match {
      case "glue" => new InMemoryGlueCatalogClient(cfg.catalogId)
      case "session" | "spark" =>
        new SparkSessionCatalogClient(spark, cfg.catalogId)
      case "hms" | "hive" =>
        // a remote-thrift endpoint in catalogProperties
        // (hive.metastore.uris, or the reference's
        // externalCatalog.hms.serverUrl) routes to the REAL
        // IMetaStoreClient over the wire; absent -> the in-memory
        // semantics twin (sandbox default)
        EmbeddedHmsCatalogClient.urisOf(cfg.properties) match {
          case Some(uris) =>
            EmbeddedHmsCatalogClient.remote(uris, cfg.catalogId,
              cfg.properties)
          case None => new InMemoryHmsCatalogClient(cfg.catalogId)
        }
      case _ => Class.forName(cfg.impl).getConstructor(classOf[String])
        .newInstance(cfg.catalogId).asInstanceOf[CatalogSyncClient]
    }
  }

  /** One dataset: resolve source → convert in place → register per-catalog.
    * Failures are per-dataset outcomes, never aborts for the batch
    * (reference RunCatalogSync.java:189-194 logs and continues).
    */
  private def runDataset(spark: SparkSession,
      dataset: graft.config.CatalogDataset,
      sourceClient: CatalogSyncClient,
      clients: Map[String, CatalogSyncClient]): Seq[Map[String, Any]] = {
    val controller = new ConversionController()

    val specFields = dataset.source.partitionSpec
      .map(graft.model.PartitionSpecDSL.parse).getOrElse(Nil)
    val source: ConversionSource = dataset.source.hierarchicalId match {
      case Some(hid) =>
        val id = CatalogSyncConfig.parseHierarchicalId(hid)
        CatalogConversionSource.fromCatalogClient(spark, sourceClient, id,
          specFields)
      case None =>
        val base = dataset.source.storageBasePath.getOrElse(
          throw new IllegalArgumentException("dataset needs a source"))
        val name = dataset.source.storageTableName.getOrElse {
          val p = base.stripSuffix("/"); p.substring(p.lastIndexOf('/') + 1)
        }
        val fmt = dataset.source.storageFormat
          .map(_.toUpperCase)
          .getOrElse(CatalogConversionSource.detectFormat(base))
        if (fmt == TableFormats.Parquet)
          new ParquetDirectorySource(spark, base, name, specFields)
        else RunSync.buildSource(spark, fmt, base, name)
    }

    val basePath = source.currentTable().basePath
    val formats = dataset.targets.map(_.tableFormat).distinct
      .filterNot(_ == source.sourceFormat)
    val targets = formats.map(f => RunSync.buildTarget(spark, f, basePath))
    // reference RunCatalogSync.java:181 always requests INCREMENTAL; the
    // controller falls back to FULL when no checkpoint exists or safety fails
    val syncOutcomes =
      controller.sync(source, targets, SyncMode.Incremental)
    val byFormat = syncOutcomes.map(o => o.targetFormat -> o).toMap

    val snap = source.currentSnapshot()
    val partitions = CatalogOrchestrator.partitionsOf(spark, snap)
    dataset.targets.map { t =>
      val id = CatalogSyncConfig.parseHierarchicalId(t.hierarchicalId)
      val sync = byFormat.get(t.tableFormat)
      // same-format targets need no conversion; everything else needs a
      // SUCCESS outcome from the sync pass
      val converted = t.tableFormat == source.sourceFormat ||
        sync.exists(_.status == "SUCCESS")
      val result: Map[String, Any] =
        if (!converted) Map("status" -> "ERROR",
          "error" -> sync.flatMap(_.error).getOrElse("conversion failed"))
        else clients.get(t.catalogId) match {
          case None => Map("status" -> "ERROR",
            "error" -> s"unknown catalogId ${t.catalogId}")
          case Some(client) =>
            val metaLoc =
              if (t.tableFormat == TableFormats.Iceberg)
                graft.formats.iceberg.IcebergMetadata.currentVersion(basePath)
                  .map(v => graft.formats.iceberg.IcebergMetadata
                    .metadataFile(basePath, v))
              else None
            val out = CatalogOrchestrator.syncTable(Seq(client), id,
              snap.table.copy(basePath = basePath), t.tableFormat, metaLoc,
              partitions)
            Map("status" -> out.head.status,
              "error" -> out.head.error.orNull)
        }
      result ++ Map[String, Any](
        "dataset" -> snap.table.name,
        "catalog" -> t.catalogId,
        "table" -> id.fqName,
        "format" -> t.tableFormat,
        "mode" -> sync.map(_.mode).getOrElse("NONE"))
    }
  }

  /** Run every dataset against an explicit client registry (testable core;
    * `main` builds the registry from the config's impl keys).
    */
  def run(spark: SparkSession, cfg: CatalogSyncConfig,
      clients: Map[String, CatalogSyncClient]): Seq[Map[String, Any]] = {
    val sourceClient = clients.getOrElse(cfg.sourceCatalog.catalogId,
      throw new IllegalArgumentException(
        s"no client for source catalog ${cfg.sourceCatalog.catalogId}"))
    cfg.datasets.flatMap { d =>
      try runDataset(spark, d, sourceClient, clients)
      catch {
        case e: Exception => Seq(Map[String, Any](
          "dataset" -> d.source.hierarchicalId
            .orElse(d.source.storageBasePath).getOrElse("?"),
          "status" -> "ERROR", "error" -> e.toString))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RunCatalogSync <catalogConfig.yaml>")
    val cfg = CatalogSyncConfig.parseFile(args(0))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-catalog-sync")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val clients = cfg.catalogById.map { case (cid, c) =>
        cid -> buildClient(spark, c)
      }
      println(Jsons.toJson(run(spark, cfg, clients)))
    } catch {
      case e: Exception =>
        println(Jsons.toJson(Map("status" -> "ERROR", "error" -> e.toString)))
        spark.stop()
        sys.exit(1)
    } finally spark.stop()
  }
}
