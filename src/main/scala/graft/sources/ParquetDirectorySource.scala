package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

import graft.model._
import graft.spi.ConversionSource

/** Treats a directory of Parquet files (flat or hive-partitioned) as a table
  * — reference ParquetConversionSource.java:70-301: schema from footers,
  * files from recursive listing, partition values from hive-style paths,
  * commit id = file modification time (Long).
  */
class ParquetDirectorySource(
    spark: SparkSession,
    basePath: String,
    tableName: String,
    partitionSpec: Seq[PartitionFieldSpec] = Nil,
    statsColumns: Option[Set[String]] = None)
  extends ConversionSource {

  private val conf = new Configuration()
  override def sourceFormat: String = TableFormats.Parquet

  private def listing: Seq[ParquetFooters.ListedFile] =
    ParquetFooters.listFiles(basePath, conf)

  override def currentTable(): TableDescriptor = {
    val files = listing
    if (files.isEmpty) throw new IllegalStateException(
      s"no parquet data files under $basePath")
    // schema from Spark's own parquet reader (footer-derived, includes
    // hive partition columns); mergeSchema so a column added by newer
    // files appears — reference infers from latest footer
    // (ParquetConversionSource.java:88-107)
    val schema = spark.read.option("mergeSchema", "true")
      .parquet(basePath).schema
    val latest = if (files.isEmpty) 0L else files.map(_.modifiedMillis).max
    val layout = if (partitionSpec.nonEmpty ||
        files.exists(f => ParquetFooters
          .partitionValuesFromPath(basePath, f.path).nonEmpty))
      Layout.HivePartitioned else Layout.Flat
    TableDescriptor(tableName, TableFormats.Parquet,
      graft.util.PathUtils.canonical(basePath), schema,
      effectiveSpec(files), layout, latest)
  }

  /** Partition spec: explicit if given, else inferred identity transforms
    * from hive-style path segments.
    */
  private def effectiveSpec(files: Seq[ParquetFooters.ListedFile])
      : Seq[PartitionFieldSpec] =
    if (partitionSpec.nonEmpty) partitionSpec
    else files.headOption.toSeq.flatMap { f =>
      ParquetFooters.partitionValuesFromPath(basePath, f.path)
        .map(pv => PartitionFieldSpec(pv.field, Transform.Value))
    }

  override def currentSnapshot(): TableSnapshot = {
    val files = listing
    val table = currentTable()
    TableSnapshot(table,
      ParquetFooters.fileEntries(spark, basePath, files, statsColumns),
      table.latestCommitMillis.toString)
  }

  /** One "commit" = all files sharing a modification timestamp. */
  override def changeForCommit(commit: String): TableChange = {
    import spark.implicits._
    val ts = commit.toLong
    val files = listing.filter(_.modifiedMillis == ts)
    val added = ParquetFooters.fileEntries(spark, basePath, files, statsColumns)
    val table = currentTable().copy(latestCommitMillis = ts)
    TableChange(commit, table,
      FilesDelta(added, spark.emptyDataset[FileEntry]))
  }

  override def commitsBacklog(lastSynced: String): Seq[String] = {
    val since = lastSynced.toLong
    listing.map(_.modifiedMillis).filter(_ > since)
      .distinct.sorted.map(_.toString)
  }

  /** Files never disappear from a plain directory source except via external
    * deletes we cannot see — incremental is safe from any instant.
    */
  override def isIncrementalSyncSafeFrom(commit: String): Boolean = true
}
