package graft.sync

import org.apache.spark.sql.SparkSession

import graft.model.{TableDescriptor, TableFormats}

/** Catalog registration of converted tables — the reference registers in
  * Glue/HMS (CatalogSync.java:52-85, GlueCatalogSyncClient /
  * HMSCatalogSyncClient); here the target catalog is the Spark session
  * catalog (`spark_catalog`), the engine-native equivalent: converted
  * tables become queryable by name via Spark SQL.
  *
  * Since the converted formats share the source's physical parquet, the
  * registered table is `USING parquet LOCATION <basePath>` — exactly the
  * storage-descriptor translation the Glue/HMS builders perform.
  */
object CatalogSync {

  def databaseName(db: String): String = db.replaceAll("[^A-Za-z0-9_]", "_")

  def createDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${databaseName(db)}")

  /** Register/refresh a converted table in the session catalog. */
  def syncTable(spark: SparkSession, db: String, table: TableDescriptor)
      : String = {
    createDatabase(spark, db)
    val fq = s"${databaseName(db)}.${table.name.replaceAll("[^A-Za-z0-9_]", "_")}"
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    val partClause =
      if (table.partitionFields.isEmpty) ""
      else table.partitionFields
        .map(_.partitionColumnName).mkString(" PARTITIONED BY (", ", ", ")")
    spark.sql(
      s"""CREATE TABLE $fq
         |USING parquet
         |$partClause
         |LOCATION '${table.basePath}'""".stripMargin)
    if (table.partitionFields.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE $fq")   // partition registration
    spark.sql(s"REFRESH TABLE $fq")
    fq
  }

  def dropTable(spark: SparkSession, fqName: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $fqName")
}
