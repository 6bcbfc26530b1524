package graft.catalog

import org.apache.spark.sql.SparkSession

/** CatalogSyncClient over the Spark session catalog — the engine-native
  * catalog this environment actually has. The same SPI the HMS/Glue-shaped
  * clients implement, expressed as Spark SQL DDL, so a conversion's final
  * registration step is pluggable across all three.
  */
class SparkSessionCatalogClient(spark: SparkSession,
    override val catalogName: String = "spark_catalog")
  extends CatalogSyncClient {

  private def fq(id: CatalogTableIdentifier): String = id.normalized.fqName

  /** Single-quote SQL string literal with embedded quotes escaped — raw
    * interpolation would let a quote in a property value or path break (or
    * inject into) the DDL statement.
    */
  private def lit(v: String): String = "'" + v.replace("'", "''") + "'"

  override def hasDatabase(db: String): Boolean =
    spark.catalog.databaseExists(CatalogTableIdentifier.normalize(db))

  override def createDatabase(db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS " +
      CatalogTableIdentifier.normalize(db))

  override def getTable(id: CatalogTableIdentifier): Option[CatalogTableDef] = {
    val n = id.normalized
    if (!spark.catalog.tableExists(n.fqName)) None
    else {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          n.table, Some(n.database)))
      val partNames = meta.partitionColumnNames.toSet
      val cols = CatalogTypes.columns(meta.schema)
      // graft-provider entries carry their table format in properties
      val fmt = meta.provider.getOrElse("parquet") match {
        case "graft" => meta.properties.getOrElse("graft.format", "GRAFT")
        case p => p.toUpperCase
      }
      Some(CatalogTableDef(n,
        graft.util.PathUtils.canonical(meta.location.getPath),
        fmt,
        cols.filterNot(c => partNames.contains(c._1)),
        cols.filter(c => partNames.contains(c._1)),
        meta.storage.inputFormat.getOrElse(""),
        meta.storage.outputFormat.getOrElse(""),
        meta.storage.serde.getOrElse(""),
        meta.properties))
    }
  }

  override def createTable(table: CatalogTableDef): Unit = {
    val n = table.identifier.normalized
    if (spark.catalog.tableExists(n.fqName))
      throw new IllegalStateException(s"table ${n.fqName} already exists")
    val props = (table.properties + ("graft.format" -> table.tableFormat))
      .map { case (k, v) => s"${lit(k)}=${lit(v)}" }.mkString(", ")
    // Every table — flat or partitioned — registers USING graft, so reads
    // resolve through the metadata plane. A raw parquet entry would also
    // read files the table format has already removed (remove actions /
    // replacecommits): the exact staleness the metadata plane exists to
    // prevent. Partition columns and pruning come from the snapshot's
    // partition spec via SnapshotFileIndex, not from catalog partition
    // entries — the same contract Delta/Iceberg tables have in a Spark
    // session catalog. Hive-style catalog partition bookkeeping is the
    // HMS/Glue clients' job (they serve engines that read via listings).
    spark.sql(
      s"""CREATE TABLE ${n.fqName}
         |USING graft
         |LOCATION ${lit(table.location)}
         |TBLPROPERTIES ($props)""".stripMargin)
  }

  override def refreshTable(table: CatalogTableDef): Unit = {
    val n = table.identifier.normalized
    val props = (table.properties + ("graft.format" -> table.tableFormat))
      .map { case (k, v) => s"${lit(k)}=${lit(v)}" }.mkString(", ")
    spark.sql(s"ALTER TABLE ${n.fqName} SET TBLPROPERTIES ($props)")
    spark.sql(s"REFRESH TABLE ${n.fqName}")
  }

  override def createOrReplaceTable(table: CatalogTableDef): Unit = {
    dropTable(table.identifier)
    createTable(table)
  }

  override def dropTable(id: CatalogTableIdentifier): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${fq(id)}")

  /** Partitions come from the metadata plane (the snapshot's live file
    * set), not from catalog partition entries — a graft-provider table has
    * none, by design (see createTable).
    */
  override def listPartitions(id: CatalogTableIdentifier)
      : Seq[CatalogPartition] = {
    getTable(id) match {
      case None => Nil
      case Some(t) =>
        val src = graft.sources.CatalogConversionSource.fromPath(
          spark, t.location, id.normalized.table)
        CatalogOrchestrator.partitionsOf(spark, src.currentSnapshot())
    }
  }

  /** The metadata plane already owns partition membership; the catalog
    * entry has nothing to add. Invalidate the cached relation so the next
    * read by name re-resolves the snapshot.
    */
  override def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit =
    spark.sql(s"REFRESH TABLE ${fq(id)}")

  override def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit =
    spark.sql(s"REFRESH TABLE ${fq(id)}")
}
