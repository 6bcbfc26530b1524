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
      .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    if (table.partitionColumns.isEmpty) {
      // flat tables register USING graft: reads then go through the
      // metadata plane (a raw parquet entry would also read files the
      // table format has already removed)
      spark.sql(
        s"""CREATE TABLE ${n.fqName}
           |USING graft
           |LOCATION '${table.location}'
           |TBLPROPERTIES ($props)""".stripMargin)
    } else {
      // hive-partitioned tables need catalog-level partition DDL
      // (ADD/DROP PARTITION), which Spark only supports on file-format
      // tables — register through parquet + explicit partition sync
      val colsDdl = (table.columns ++ table.partitionColumns)
        .map { case (c, t) => s"`$c` $t" }.mkString(", ")
      val partClause = table.partitionColumns.map(c => s"`${c._1}`")
        .mkString(" PARTITIONED BY (", ", ", ")")
      spark.sql(
        s"""CREATE TABLE ${n.fqName} ($colsDdl)
           |USING parquet
           |$partClause
           |LOCATION '${table.location}'
           |TBLPROPERTIES ($props)""".stripMargin)
    }
  }

  override def refreshTable(table: CatalogTableDef): Unit = {
    val n = table.identifier.normalized
    val props = (table.properties + ("graft.format" -> table.tableFormat))
      .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE ${n.fqName} SET TBLPROPERTIES ($props)")
    spark.sql(s"REFRESH TABLE ${n.fqName}")
  }

  override def createOrReplaceTable(table: CatalogTableDef): Unit = {
    dropTable(table.identifier)
    createTable(table)
  }

  override def dropTable(id: CatalogTableIdentifier): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${fq(id)}")

  override def listPartitions(id: CatalogTableIdentifier)
      : Seq[CatalogPartition] = {
    val n = id.normalized
    val cat = spark.sessionState.catalog
    cat.listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(
      n.table, Some(n.database)))
      .map { p =>
        val meta = cat.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(
            n.table, Some(n.database)))
        CatalogPartition(
          meta.partitionColumnNames.map(c => p.spec.getOrElse(c, "")),
          graft.util.PathUtils.canonical(p.location.getPath))
      }
  }

  override def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit = {
    val n = id.normalized
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(n.table, Some(n.database)))
    val cols = meta.partitionColumnNames
    parts.foreach { p =>
      val spec = cols.zip(p.values)
        .map { case (c, v) => s"`$c`='$v'" }.mkString(", ")
      spark.sql(s"ALTER TABLE ${n.fqName} ADD IF NOT EXISTS " +
        s"PARTITION ($spec) LOCATION '${p.location}'")
    }
  }

  override def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit = {
    val n = id.normalized
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(n.table, Some(n.database)))
    val cols = meta.partitionColumnNames
    values.foreach { v =>
      val spec = cols.zip(v).map { case (c, x) => s"`$c`='$x'" }.mkString(", ")
      spark.sql(s"ALTER TABLE ${n.fqName} DROP IF EXISTS PARTITION ($spec)")
    }
  }
}
