package graft.catalog

import graft.model.{TableDescriptor, TableFormats}

/** Per-format storage-descriptor builders — the reference ships one per
  * (catalog, format) pair (IcebergGlueCatalogTableBuilder.java,
  * DeltaHMSCatalogTableBuilder.java, HudiCatalogTableBuilder, …); the
  * catalog entry must carry exactly the input/output/serde classes and
  * properties each ecosystem keys on, or downstream engines open the table
  * wrong. Class names and property keys here are the public Hive/Glue
  * integration contracts of each format.
  */
object CatalogTableBuilders {

  private val ParquetInput =
    "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat"
  private val ParquetOutput =
    "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"
  private val ParquetSerde =
    "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"

  /** Build the catalog view of a converted table.
    *
    * @param metadataLocation Iceberg's current metadata.json path — the
    *   Iceberg catalog contract resolves the table through it.
    */
  def forTable(id: CatalogTableIdentifier, table: TableDescriptor,
      targetFormat: String, metadataLocation: Option[String] = None)
      : CatalogTableDef = {
    val partNames = table.partitionFields.map(_.partitionColumnName)
    val allCols = CatalogTypes.columns(table.schema)
    val (partCols0, dataCols) = allCols.partition(c => partNames.contains(c._1))
    // layout-only partition columns (e.g. a DAY transform's ts_day) are not
    // in the logical schema; register them as strings, same as the path form
    val partCols = partNames.map { n =>
      partCols0.find(_._1 == n).getOrElse(n -> "string")
    }
    targetFormat match {
      case TableFormats.Iceberg => CatalogTableDef(
        id, table.basePath, targetFormat, dataCols, partCols,
        // Iceberg's HiveCatalog contract: table_type + metadata_location
        // (reference IcebergGlueCatalogTableBuilder.java)
        inputFormat = "org.apache.iceberg.mr.hive.HiveIcebergInputFormat",
        outputFormat = "org.apache.iceberg.mr.hive.HiveIcebergOutputFormat",
        serde = "org.apache.iceberg.mr.hive.HiveIcebergSerDe",
        properties = Map(
          "table_type" -> "ICEBERG",
          "EXTERNAL" -> "TRUE") ++
          metadataLocation.map("metadata_location" -> _))
      case TableFormats.Delta => CatalogTableDef(
        id, table.basePath, targetFormat, dataCols, partCols,
        // Spark resolves Delta catalog entries via the provider property
        // (reference DeltaCatalogTableBuilder)
        inputFormat = ParquetInput, outputFormat = ParquetOutput,
        serde = ParquetSerde,
        properties = Map(
          "spark.sql.sources.provider" -> "delta",
          "EXTERNAL" -> "TRUE"))
      case TableFormats.Hudi => CatalogTableDef(
        id, table.basePath, targetFormat, dataCols, partCols,
        // Hudi's Hive integration reads COW tables through its own input
        // format (reference HudiCatalogTableBuilder)
        inputFormat = "org.apache.hudi.hadoop.HoodieParquetInputFormat",
        outputFormat = ParquetOutput, serde = ParquetSerde,
        properties = Map(
          "spark.sql.sources.provider" -> "hudi",
          "EXTERNAL" -> "TRUE"))
      case _ => CatalogTableDef(
        id, table.basePath, targetFormat, dataCols, partCols,
        inputFormat = ParquetInput, outputFormat = ParquetOutput,
        serde = ParquetSerde,
        properties = Map("EXTERNAL" -> "TRUE"))
    }
  }
}
