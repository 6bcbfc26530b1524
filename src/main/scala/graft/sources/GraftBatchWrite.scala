package graft.sources

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{PartitionFieldSpec, TableDescriptor, TableSnapshot, Transform}
import graft.util.HadoopConfs

/** Batch writes to NON-Delta graft tables —
  * `df.write.format("graft").option("tableFormat", "iceberg"|"hudi"|
  * "paimon")` (Delta keeps its richer native path in
  * [[graft.formats.delta.DeltaWrite]]: constraints, column mapping,
  * streamed txn commits).
  *
  * Mechanics: the rows land as parquet in a staged subdir of the table
  * (hive layout when `partitionBy` is set), their stats come from a
  * distributed footer scan, and the commit rides the format's
  * conversion target as a full-set snapshot sync — append = live set ∪
  * staged, overwrite = staged only (the target's anti-join diff turns
  * that into removes+adds). One code path, three formats, and every
  * scale property of the sync targets (executor-authored manifests,
  * streamed commit lines, CAS + retry) applies to user writes for free.
  *
  * Guard rails: an existing table pins the format (a `tableFormat`
  * that disagrees refuses); appends require the exact table schema
  * (evolve first via `GRAFT ALTER TABLE`) and the table's partition
  * columns; `partitionBy` on an existing unpartitioned table refuses.
  */
object GraftBatchWrite {

  def write(spark: SparkSession, rawPath: String, df: DataFrame,
      fmt: String, overwrite: Boolean,
      partitionCols: Seq[String]): Unit = {
    val path = graft.util.PathUtils.canonical(rawPath)
    val name = path.stripSuffix("/").split('/').last
    require(Seq("ICEBERG", "HUDI", "PAIMON").contains(fmt),
      s"GraftBatchWrite handles iceberg/hudi/paimon, not $fmt")

    val existing: Option[graft.spi.ConversionSource] =
      CatalogConversionSource.detectFormat(path) match {
        case graft.model.TableFormats.Parquet => None // not created yet
        case f if f == fmt =>
          Some(CatalogConversionSource.fromPath(spark, path, name))
        case other => throw new IllegalArgumentException(
          s"table at $path is $other but tableFormat=$fmt was requested")
      }

    // schema + partitioning gates against the existing table
    val parts: Seq[String] = existing match {
      case Some(src) =>
        val table = src.currentTable()
        val cur = table.schema
        val curSig = cur.map(f => (f.name, f.dataType.catalogString))
        val newSig = df.schema.map(f => (f.name, f.dataType.catalogString))
        require(curSig == newSig,
          s"schema mismatch: table has ${cur.toDDL}, write has " +
            s"${df.schema.toDDL} — evolve with GRAFT ALTER TABLE first")
        val tableParts = table.partitionFields.map(_.partitionColumnName)
        require(partitionCols.isEmpty || partitionCols == tableParts,
          s"partitionBy(${partitionCols.mkString(",")}) does not match " +
            s"the table's partitioning (${tableParts.mkString(",")})")
        tableParts
      case None => partitionCols
    }
    parts.foreach(p => require(df.schema.fieldNames.contains(p),
      s"partition column $p is not in the written columns"))

    val staged = s"$path/data-${UUID.randomUUID()}"
    if (parts.isEmpty) df.write.parquet(staged)
    else df.write.partitionBy(parts: _*).parquet(staged)

    val conf = HadoopConfs.session(spark)
    val listed = ParquetFooters.listFiles(staged, conf)
    val adds = ParquetFooters.fileEntries(spark, staged, listed)

    val table = existing.map(_.currentTable()).getOrElse(
      TableDescriptor(name, fmt, path, df.schema.json,
        parts.map(PartitionFieldSpec(_, Transform.Value)),
        if (parts.nonEmpty) graft.model.Layout.HivePartitioned
        else graft.model.Layout.Flat,
        System.currentTimeMillis()))

    // commit with CAS-loss retry: a concurrent writer advancing the
    // table between our live-set read and the commit is NOT a conflict
    // for an append (and an overwrite's victim set is whatever is live
    // at commit time) — recompute the live set against the new head and
    // re-land. Bounded; any non-CAS error surfaces immediately.
    var attempt = 0
    var done = false
    while (!done) {
      val live = CatalogConversionSource.detectFormat(path) match {
        case graft.model.TableFormats.Parquet => None
        case _ => Some(CatalogConversionSource.fromPath(spark, path, name))
      }
      val files = live match {
        case Some(src) if !overwrite =>
          graft.plans.SnapshotFileIndex.listingFor(src.currentSnapshot())
            .unionByName(adds)
        case _ => adds
      }
      val snapshot = TableSnapshot(table, files,
        s"${System.currentTimeMillis()}-$attempt")
      val target: graft.spi.ConversionTarget = fmt match {
        case "ICEBERG" =>
          new graft.formats.iceberg.IcebergConversionTarget(spark, path)
        case "HUDI" =>
          new graft.formats.hudi.HudiConversionTarget(spark, path)
        case "PAIMON" =>
          new graft.formats.paimon.PaimonConversionTarget(spark, path)
      }
      val outcomes = graft.sync.TableFormatSync.syncSnapshot(Seq(target),
        snapshot, "GRAFT_WRITE")
      outcomes.find(_.status != "SUCCESS") match {
        case None => done = true
        case Some(o) if o.error.exists(_.contains("concurrent writer")) &&
            attempt < 5 =>
          attempt += 1
          Thread.sleep(50L * attempt)
        case Some(o) =>
          throw new IllegalStateException(s"graft write to $fmt failed: $o")
      }
    }
  }

  /** Does ANY graft-readable metadata plane exist at the path? (the
    * SaveMode existence probe — format-agnostic, unlike the Delta-only
    * latestVersion check)
    */
  def tableExists(path: String): Boolean =
    CatalogConversionSource.detectFormat(path) !=
      graft.model.TableFormats.Parquet
}
