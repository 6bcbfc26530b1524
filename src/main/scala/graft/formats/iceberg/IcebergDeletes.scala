package graft.formats.iceberg

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.formats.iceberg.IcebergManifests.DeleteFileRef
import graft.model.{DeletionVectorsUnsupported, FileEntry}

/** Iceberg v2 row-level deletes (spec §Row-level Deletes) in graft's
  * table layout — the Iceberg analog of the Delta deletion-vector path
  * (reference delta guard: DeltaConversionSource.java:104-174; Iceberg
  * delete-file semantics: spec §Delete Formats).
  *
  * - [[appendPositionDeletes]] commits a position-delete snapshot: delete
  *   parquet files (`file_path` string, `pos` long — the spec's required
  *   position-delete columns, in the spec's required (path, pos) sort
  *   order), a `content`=1 delete manifest whose entries carry
  *   data_file.content=1, a manifest list carrying every previous
  *   manifest verbatim plus the delete manifest, and a new metadata
  *   version. The delete set is written distributed (one delete file per
  *   partition of the input) — never driver-materialized.
  * - [[applyPositionDeletes]] masks deleted (file, pos) rows out of a
  *   data scan with an anti-join on the parquet reader's `_metadata`
  *   column — the same shape as the Delta DV mask, so the plan stays a
  *   single scan + (broadcast) anti-join at any table size.
  * - Equality deletes (content=2) are refused loudly everywhere: applying
  *   them correctly needs sequence-number ordering per data file, and a
  *   partial application is the silent-wrong-answer class this module
  *   exists to close.
  */
object IcebergDeletes {

  /** Broadcast the deleted-position set only while its estimated footprint
    * stays modest (mirrors the Delta DV byte gate): above it, the
    * anti-join shuffles both sides — still correct, never memory-bound.
    */
  private val BroadcastDeleteBytes = 64L * 1024 * 1024

  def liveDeleteRefs(m: IcebergTableMetadata, seq: Long): Seq[DeleteFileRef] =
    m.snapshotBySeq(seq) match {
      case None => Nil
      case Some(s) => IcebergManifests.liveDeleteFiles(s.manifestList)
    }

  /** Commit a position-delete snapshot. `deletes` must have columns
    * `file_path` (canonical data-file path, as the manifests spell it)
    * and `pos` (0-based row position within that file).
    */
  def appendPositionDeletes(spark: SparkSession, tablePath: String,
      deletes: DataFrame): Unit = {
    val version = IcebergMetadata.currentVersion(tablePath).getOrElse(
      throw new IllegalStateException(s"no Iceberg table at $tablePath"))
    val m = IcebergMetadata.read(tablePath, version)
    val now = System.currentTimeMillis()
    val snapshotId = m.lastSequenceNumber + 1
    val seq = snapshotId

    // spec: position delete files sort by (file_path, pos) so readers can
    // merge-scan them against the data file
    val deleteDir = s"$tablePath/data/deletes-$seq-${UUID.randomUUID()}"
    deletes
      .select(col("file_path").cast("string").as("file_path"),
        col("pos").cast("long").as("pos"))
      .sortWithinPartitions("file_path", "pos")
      .write.parquet(deleteDir)

    val conf = spark.sessionState.newHadoopConf()
    val written = graft.sources.ParquetFooters.listFiles(deleteDir, conf)
    // per-file record counts from the footers the write just produced —
    // O(delete files per commit), not O(rows)
    val files = written.map { f =>
      val (rows, _) = graft.sources.ParquetFooters.readFooterStats(
        f.path, conf, Some(Set.empty))
      (f, rows)
    }.filter(_._2 > 0)

    val mdir = IcebergMetadata.metadataDir(tablePath)
    val manifestPath = s"$mdir/m-${UUID.randomUUID()}-deletes.avro"
    var nFiles = 0
    var nRows = 0L
    val len = IcebergManifests.writeManifest(manifestPath,
      files.iterator.map { case (f, rows) =>
        nFiles += 1; nRows += rows
        IcebergManifests.toEntry(
          FileEntry(f.path, f.length, rows, "parquet", Nil, Nil,
            f.modifiedMillis),
          IcebergManifests.Status.Added, snapshotId, m.schema, content = 1)
      })

    val carried = m.currentSnapshot
      .map(s => IcebergManifests.readManifestListRecords(s.manifestList))
      .getOrElse(Nil)
    val listPath = s"$mdir/snap-$snapshotId-manifest-list.avro"
    IcebergManifests.writeManifestListRecords(listPath, carried,
      Seq(IcebergManifests.ManifestSummary(manifestPath, len, snapshotId,
        nFiles, 0, 0, nRows, 0L, content = 1)))

    val ok = IcebergMetadata.write(tablePath, version + 1, m.copy(
      lastSequenceNumber = seq,
      lastUpdatedMs = now,
      currentSnapshotId = snapshotId,
      // no sourceIdentifier: this is a row-level write, not a sync — the
      // target's corrupt-commit rollback must never touch it
      snapshots = m.snapshots :+
        IcebergSnapshot(snapshotId, seq, now, listPath, None)))
    if (!ok) throw new IllegalStateException(
      s"concurrent writer committed metadata v${version + 1} first at $tablePath")
  }

  /** Mask position-deleted rows out of a data scan. Refuses equality
    * deletes. `df` must be a direct file-scan DataFrame (the `_metadata`
    * column must still resolve).
    */
  def applyPositionDeletes(spark: SparkSession, df: DataFrame,
      refs: Seq[DeleteFileRef], tablePath: String): DataFrame = {
    if (refs.isEmpty) return df
    val eq = refs.filter(_.content == 2)
    if (eq.nonEmpty) throw new DeletionVectorsUnsupported(
      s"table at $tablePath has ${eq.size} live EQUALITY delete file(s) — " +
        "equality deletes need per-file sequence-number ordering to apply " +
        "and are unsupported; compact/rewrite the table (purge delete " +
        "files) first")
    val pos = refs.filter(_.content == 1)
    val deleted = spark.read.parquet(pos.map(_.path): _*)
      .select(graft.util.PathCols.canonical(col("file_path"))
        .as("__del_path"), col("pos").as("__del_pos"))
    val keyed = df
      .withColumn("__scan_path",
        graft.util.PathCols.scanPath(col("_metadata.file_path")))
      .withColumn("__scan_pos", col("_metadata.row_index"))
    val estBytes = pos.map(r => r.recordCount * 116L).sum
    val right =
      if (estBytes <= BroadcastDeleteBytes) broadcast(deleted) else deleted
    keyed.join(right,
        keyed("__scan_path") === right("__del_path") &&
          keyed("__scan_pos") === right("__del_pos"), "left_anti")
      .drop("__scan_path", "__scan_pos")
  }
}
