package graft.formats.iceberg

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * - [[appendEqualityDeletes]] commits an equality-delete snapshot: the
  *   delete parquet carries the equality columns themselves, and the
  *   manifest entry records their field ids (`equality_ids`,
  *   data_file.content=2).
  * - [[appendDataFiles]] commits an APPEND snapshot (new data manifest at
  *   the new sequence number, previous manifests carried verbatim) —
  *   needed because file-level metadata sync is refused while deletes
  *   are live, and because delete application is sequence-ordered.
  * - [[applyDeletes]] masks deleted rows out of a data scan. Position
  *   deletes anti-join on (file, pos) via the parquet reader's
  *   `_metadata` column. Equality deletes follow the spec's ordering
  *   rule: a delete at sequence S masks only rows of data files with
  *   sequence < S — a row re-inserted AFTER the delete survives. Both
  *   are scan + (broadcast) anti-join plans at any table size.
  */
object IcebergDeletes {

  /** Broadcast a deleted-key set only while its estimated footprint
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
    // spec: position delete files sort by (file_path, pos) so readers can
    // merge-scan them against the data file
    val rows = deletes
      .select(col("file_path").cast("string").as("file_path"),
        col("pos").cast("long").as("pos"))
      .sortWithinPartitions("file_path", "pos")
    appendCommit(spark, tablePath, rows, content = 1, equalityIds = Nil)
  }

  /** Commit an equality-delete snapshot: `deletes` carries the equality
    * columns (table-schema names); every data row committed at a LOWER
    * sequence that matches all of them (null-safe) is deleted.
    */
  def appendEqualityDeletes(spark: SparkSession, tablePath: String,
      deletes: DataFrame, equalityCols: Seq[String]): Unit = {
    require(equalityCols.nonEmpty, "equality delete needs >= 1 column")
    val m = currentMeta(spark, tablePath)._2
    val idByName = IcebergSchemas.leafFields(m.schema)
      .map { case (id, name, _) => name -> id }.toMap
    val ids = equalityCols.map(c => idByName.getOrElse(c,
      throw new IllegalArgumentException(
        s"equality column $c not in table schema at $tablePath")))
    appendCommit(spark, tablePath,
      deletes.select(equalityCols.map(col): _*), content = 2,
      equalityIds = ids)
  }

  /** Commit an APPEND snapshot: the parquet files under `parquetDir`
    * become a new data manifest at the new sequence number; previous
    * manifests (data AND delete) are carried verbatim, so their
    * sequence numbers — the delete-application ordering — are preserved.
    * Entries carry no column bounds (stat skipping simply cannot prune
    * them — safe, never wrong).
    */
  def appendDataFiles(spark: SparkSession, tablePath: String,
      parquetDir: String): Unit =
    appendCommit(spark, tablePath, rows = null, content = 0,
      equalityIds = Nil, dataDir = Some(parquetDir))

  private def currentMeta(spark: SparkSession, tablePath: String)
      : (Long, IcebergTableMetadata) = {
    val version = IcebergMetadata.currentVersion(tablePath).getOrElse(
      throw new IllegalStateException(s"no Iceberg table at $tablePath"))
    (version, IcebergMetadata.read(tablePath, version))
  }

  /** Rewrite the table as its delete-applied rows and commit a REPLACE
    * snapshot whose manifest list holds ONLY the fresh data manifest —
    * every delete file is purged, so the file-level surfaces (sync,
    * `format("graft")`, snapshot listing) work again. This is the
    * "compact/rewrite the table" remedy the refusal messages point to.
    * Returns true if a rewrite happened (false = no live deletes, no-op).
    */
  def rewriteWithDeletes(spark: SparkSession, tablePath: String): Boolean = {
    val (_, m) = currentMeta(spark, tablePath)
    if (liveDeleteRefs(m, m.lastSequenceNumber).isEmpty) return false
    val src = new IcebergConversionSource(spark, tablePath,
      m.properties.getOrElse("graft.table-name", "table"))
    val seq = m.lastSequenceNumber + 1
    val dataDir = s"$tablePath/data/compact-$seq-${UUID.randomUUID()}"
    src.toDataFrame.write.parquet(dataDir)
    appendCommit(spark, tablePath, rows = null, content = 0,
      equalityIds = Nil, dataDir = Some(dataDir), replace = true)
    true
  }

  /** Shared commit writer for the append kinds: stage the file(s), write
    * one manifest (content 0 = data, 1/2 = deletes), write a manifest
    * list carrying every previous manifest record verbatim (or NONE for
    * a replace), CAS the next metadata version.
    */
  private def appendCommit(spark: SparkSession, tablePath: String,
      rows: DataFrame, content: Int, equalityIds: Seq[Int],
      dataDir: Option[String] = None, replace: Boolean = false): Unit = {
    val (version, m) = currentMeta(spark, tablePath)
    val now = System.currentTimeMillis()
    val snapshotId = m.lastSequenceNumber + 1
    val seq = snapshotId

    val fileDir = dataDir.getOrElse {
      val d = s"$tablePath/data/deletes-$seq-${UUID.randomUUID()}"
      rows.write.parquet(d)
      d
    }
    val conf = spark.sessionState.newHadoopConf()
    val written = graft.sources.ParquetFooters.listFiles(fileDir, conf)
    // per-file record counts from the parquet footers — O(files per
    // commit), not O(rows)
    val files = written.map { f =>
      val (nRows, _) = graft.sources.ParquetFooters.readFooterStats(
        f.path, conf, Some(Set.empty))
      (f, nRows)
    }.filter(_._2 > 0)

    val mdir = IcebergMetadata.metadataDir(tablePath)
    val suffix = if (content == 0) "append" else "deletes"
    val manifestPath = s"$mdir/m-${UUID.randomUUID()}-$suffix.avro"
    var nFiles = 0
    var nRows = 0L
    val len = IcebergManifests.writeManifest(manifestPath,
      files.iterator.map { case (f, rowCount) =>
        nFiles += 1; nRows += rowCount
        IcebergManifests.toEntry(
          FileEntry(f.path, f.length, rowCount, "parquet", Nil, Nil,
            f.modifiedMillis),
          IcebergManifests.Status.Added, snapshotId, m.schema,
          content = if (content == 0) 0 else content,
          equalityIds = equalityIds)
      })

    val carried =
      if (replace) Nil
      else m.currentSnapshot
        .map(s => IcebergManifests.readManifestListRecords(s.manifestList))
        .getOrElse(Nil)
    val listPath = s"$mdir/snap-$snapshotId-manifest-list.avro"
    IcebergManifests.writeManifestListRecords(listPath, carried,
      Seq(IcebergManifests.ManifestSummary(manifestPath, len, snapshotId,
        nFiles, 0, 0, nRows, 0L,
        content = if (content == 0) 0 else 1)))

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

  /** Mask every live row-level delete out of a data scan. `df` must be a
    * direct file-scan DataFrame (the `_metadata` column must still
    * resolve). Position deletes anti-join on (file, pos); equality
    * deletes anti-join on the equality columns with the sequence rule
    * `delete seq > data-file seq`.
    */
  def applyDeletes(spark: SparkSession, df: DataFrame,
      m: IcebergTableMetadata, seq: Long, tablePath: String): DataFrame = {
    val refs = liveDeleteRefs(m, seq)
    if (refs.isEmpty) return df
    val pos = refs.filter(_.content == 1)
    val eq = refs.filter(_.content == 2)
    val bad = eq.filter(_.equalityIds.isEmpty)
    if (bad.nonEmpty) throw new DeletionVectorsUnsupported(
      s"table at $tablePath has ${bad.size} equality delete file(s) with " +
        "no equality_ids recorded — cannot apply them correctly")
    val manifestList = m.snapshotBySeq(seq).get.manifestList
    var out = applyPositionDeletes(spark, df, pos, tablePath)
    if (eq.nonEmpty)
      out = applyEqualityDeletes(spark, out, eq, manifestList, m, tablePath)
    out
  }

  /** Mask position-deleted rows out of a data scan. Position deletes name
    * their data file by path, and paths are write-once, so no sequence
    * comparison is needed (a delete can only follow its file).
    */
  def applyPositionDeletes(spark: SparkSession, df: DataFrame,
      refs: Seq[DeleteFileRef], tablePath: String): DataFrame = {
    val pos = refs.filter(_.content == 1)
    if (pos.isEmpty) return df
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

  /** Mask equality-deleted rows: one anti-join per distinct equality-id
    * signature, null-safe on the equality columns, guarded by the spec's
    * ordering rule (`delete seq > data-file seq`) so rows appended after
    * the delete survive it.
    */
  private def applyEqualityDeletes(spark: SparkSession, df: DataFrame,
      eqRefs: Seq[DeleteFileRef], manifestList: String,
      m: IcebergTableMetadata, tablePath: String): DataFrame = {
    import spark.implicits._
    val nameById = IcebergSchemas.leafFields(m.schema)
      .map { case (id, name, _) => id -> name }.toMap
    // file → sequence map, built executor-side; broadcast only while the
    // estimated footprint (added+existing rows of data manifests ≈ file
    // count upper bound is unavailable, so use file counts) stays small
    val nDataFiles = IcebergManifests.readManifestListRecords(manifestList)
      .filter(r => IcebergManifests.contentOf(r) == 0)
      .map(r => r.get("added_files_count").asInstanceOf[Int].toLong +
        r.get("existing_files_count").asInstanceOf[Int].toLong)
      .sum
    val seqDf = IcebergManifests.liveDataFileSeqs(spark, manifestList)
      .toDF("__ds_path", "__ds_seq")
    val seqRight =
      if (nDataFiles * 150L <= BroadcastDeleteBytes) broadcast(seqDf)
      else seqDf
    var out = df
      .withColumn("__scan_path",
        graft.util.PathCols.scanPath(col("_metadata.file_path")))
      .join(seqRight, col("__scan_path") === col("__ds_path"), "left")
      .drop("__ds_path")
    eqRefs.groupBy(_.equalityIds)
      .foreach { case (ids, files) =>
      val cols = ids.map(id => nameById.getOrElse(id,
        throw new DeletionVectorsUnsupported(
          s"equality delete references unknown field id $id at $tablePath")))
      val fileSeq = files.map(f => (f.path, f.seq))
        .toDF("__dq_path", "__dq_seq")
      val delRows = spark.read.parquet(files.map(_.path): _*)
        .withColumn("__dpath",
          graft.util.PathCols.scanPath(col("_metadata.file_path")))
        .join(broadcast(fileSeq), col("__dpath") === col("__dq_path"))
        .select(cols.map(c => col(c).as(s"__d_$c")) :+ col("__dq_seq"): _*)
      val cond: Column = cols
        .map(c => out(c) <=> delRows(s"__d_$c"))
        .reduce(_ && _) && delRows("__dq_seq") > out("__ds_seq")
      val estBytes = files.map(_.fileSizeBytes).sum * 4
      val right =
        if (estBytes <= BroadcastDeleteBytes) broadcast(delRows)
        else delRows
      out = out.join(right, cond, "left_anti")
    }
    out.drop("__scan_path", "__ds_seq")
  }
}
