package graft.formats.paimon

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.model._
import graft.spi._
import graft.util.PathUtils

/** Paimon source — reference PaimonConversionSource.java:52-231: snapshots
  * by id; live set = base ∪ delta manifests with ADD/DELETE reconciliation;
  * per-snapshot diff from the delta manifest list.
  */
class PaimonConversionSource(spark: SparkSession, tablePath: String,
    tableName: String)
  extends ConversionSource {

  override def sourceFormat: String = "PAIMON"

  private def latest: Long = PaimonFormat.latestSnapshotId(tablePath)
    .getOrElse(throw new IllegalStateException(s"no Paimon table at $tablePath"))

  private def entryToFile(e: GenericRecord): FileEntry = {
    def strMap(f: String) = e.get(f)
      .asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
      .map { case (k, v) => k.toString -> v }.toMap
    val mins = strMap("minValues"); val maxs = strMap("maxValues")
    val nulls = strMap("nullCounts")
    val fields = (mins.keySet ++ maxs.keySet ++ nulls.keySet).toSeq.sorted
    val stats = fields.map { f =>
      FileColumnStat(f, mins.get(f).map(_.toString), maxs.get(f).map(_.toString),
        nulls.get(f).map(_.toString.toLong).getOrElse(0L),
        e.get("rowCount").asInstanceOf[Long], 0L)
    }
    FileEntry(
      PathUtils.resolve(tablePath, e.get("fileName").toString),
      e.get("fileSize").asInstanceOf[Long],
      e.get("rowCount").asInstanceOf[Long],
      "parquet",
      e.get("partition").asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
        .map { case (k, v) => PartitionMember(k.toString, v.toString) }
        .toSeq.sortBy(_.field),
      stats,
      e.get("lastModifiedMs").asInstanceOf[Long])
  }

  /** (kind, entry) pairs for one snapshot's full state. */
  private def entriesAt(id: Long): Seq[(Int, FileEntry)] = {
    val snap = PaimonFormat.readSnapshot(tablePath, id)
    val manifests = PaimonFormat.readManifestList(snap.baseManifestList) ++
      PaimonFormat.readManifestList(snap.deltaManifestList)
    manifests.flatMap { m =>
      PaimonFormat.readManifest(s"${PaimonFormat.manifestDir(tablePath)}/$m")
        .map(e => (e.get("kind").asInstanceOf[Int], entryToFile(e)))
    }
  }

  private def liveAt(id: Long): Seq[FileEntry] = {
    val deleted = entriesAt(id).collect {
      case (k, f) if k == PaimonFormat.Kind.Delete => f.path
    }.toSet
    entriesAt(id).collect {
      case (k, f) if k == PaimonFormat.Kind.Add && !deleted.contains(f.path) => f
    }
  }

  override def currentTable(): TableDescriptor = {
    val snap = PaimonFormat.readSnapshot(tablePath, latest)
    val schema = PaimonFormat.readSchema(tablePath, snap.schemaId)
    TableDescriptor(tableName, "PAIMON", PathUtils.canonical(tablePath),
      schema.schema,
      schema.partitionKeys.map(k => PartitionFieldSpec(k, Transform.Value)),
      if (schema.partitionKeys.nonEmpty) Layout.HivePartitioned else Layout.Flat,
      latest)
  }

  override def currentSnapshot(): TableSnapshot = {
    import spark.implicits._
    TableSnapshot(currentTable(), spark.createDataset(liveAt(latest)),
      latest.toString)
  }

  override def changeForCommit(commit: String): TableChange = {
    import spark.implicits._
    val snap = PaimonFormat.readSnapshot(tablePath, commit.toLong)
    val delta = PaimonFormat.readManifestList(snap.deltaManifestList)
      .flatMap { m =>
        PaimonFormat.readManifest(s"${PaimonFormat.manifestDir(tablePath)}/$m")
          .map(e => (e.get("kind").asInstanceOf[Int], entryToFile(e)))
      }
    TableChange(commit, currentTable().copy(latestCommitMillis = commit.toLong),
      FilesDelta(
        spark.createDataset(delta.collect {
          case (k, f) if k == PaimonFormat.Kind.Add => f }),
        spark.createDataset(delta.collect {
          case (k, f) if k == PaimonFormat.Kind.Delete => f })))
  }

  override def commitsBacklog(lastSynced: String): Seq[String] =
    PaimonFormat.listSnapshotIds(tablePath)
      .filter(_ > lastSynced.toLong).map(_.toString)

  override def isIncrementalSyncSafeFrom(commit: String): Boolean =
    PaimonFormat.listSnapshotIds(tablePath).contains(commit.toLong) ||
      PaimonFormat.listSnapshotIds(tablePath).headOption
        .contains(commit.toLong + 1)

  def toDataFrame: DataFrame =
    graft.formats.delta.DeltaRead.toDataFrame(spark, currentSnapshot())
}

/** Paimon target — **beyond the reference**, which lists PAIMON as a source
  * only (`TableFormat.values()` has no PaimonConversionTarget, SURVEY §2.2):
  * each sync writes a delta manifest (ADD + DELETE entries) and a snapshot
  * pointing at the previous base ∪ delta as its new base.
  */
class PaimonConversionTarget(spark: SparkSession, tablePath: String)
  extends ConversionTarget {

  override def targetFormat: String = "PAIMON"

  private var table: TableDescriptor = _
  private var schema: StructType = _
  private var partitionSpec: Seq[PartitionFieldSpec] = Nil
  private var syncMeta: Option[SyncMetadata] = None
  private var pendingAdds: Option[Dataset[FileEntry]] = None
  private var pendingRemoves: Option[Dataset[FileEntry]] = None

  override def beginSync(t: TableDescriptor): Unit = {
    table = t; schema = t.schema
    pendingAdds = None; pendingRemoves = None
  }
  override def syncMetadata(m: SyncMetadata): Unit = syncMeta = Some(m)
  override def syncSchema(s: StructType): Unit = schema = s
  override def syncPartitionSpec(spec: Seq[PartitionFieldSpec]): Unit =
    partitionSpec = spec

  override def syncFilesForSnapshot(files: Dataset[FileEntry]): Unit =
    PaimonFormat.latestSnapshotId(tablePath) match {
      case None => pendingAdds = Some(files); pendingRemoves = None
      case Some(_) =>
        val current = new PaimonConversionSource(spark, tablePath, "target")
          .currentSnapshot().files
        val delta = FilesDelta.between(files, current)
        pendingAdds = Some(delta.added)
        pendingRemoves = Some(delta.removed)
    }

  override def syncFilesForDiff(diff: FilesDelta): Unit = {
    pendingAdds = Some(diff.added); pendingRemoves = Some(diff.removed)
  }

  private def toEntry(f: FileEntry, kind: Int): GenericRecord = {
    val e = new GenericData.Record(PaimonFormat.EntrySchema)
    e.put("kind", kind)
    e.put("partition", f.partitionValues.map(p => p.field -> p.value)
      .toMap.asJava)
    e.put("bucket", 0)
    e.put("fileName", f.path)
    e.put("fileSize", f.fileSizeBytes)
    e.put("rowCount", f.recordCount)
    e.put("minValues", f.columnStats.flatMap(s => s.min.map(s.field -> _))
      .toMap.asJava)
    e.put("maxValues", f.columnStats.flatMap(s => s.max.map(s.field -> _))
      .toMap.asJava)
    e.put("nullCounts", f.columnStats
      .map(s => s.field -> java.lang.Long.valueOf(s.numNulls)).toMap.asJava)
    e.put("lastModifiedMs", f.lastModifiedMillis)
    e
  }

  override def completeSync(): Unit = {
    val prevId = PaimonFormat.latestSnapshotId(tablePath)
    val id = prevId.map(_ + 1).getOrElse(1L)
    val mdir = PaimonFormat.manifestDir(tablePath)

    if (prevId.isEmpty)
      PaimonFormat.writeSchema(tablePath, PaimonFormat.PaimonSchema(0, schema,
        partitionSpec.map(_.partitionColumnName), Map.empty))

    // base = previous base ∪ previous delta (manifest reuse, no rewrite);
    // compacted into one manifest once the list grows past the threshold
    val base: Seq[String] = {
      val raw = prevId.map { p =>
        val s = PaimonFormat.readSnapshot(tablePath, p)
        PaimonFormat.readManifestList(s.baseManifestList) ++
          PaimonFormat.readManifestList(s.deltaManifestList)
      }.getOrElse(Nil)
      if (raw.size <= 16) raw
      else {
        val merged = s"manifest-${UUID.randomUUID()}-compacted"
        val deleted = raw.flatMap(m => PaimonFormat.readManifest(s"$mdir/$m"))
          .filter(_.get("kind").asInstanceOf[Int] == PaimonFormat.Kind.Delete)
          .map(_.get("fileName").toString).toSet
        val live = raw.iterator.flatMap(m =>
          PaimonFormat.readManifest(s"$mdir/$m"))
          .filter(e => e.get("kind").asInstanceOf[Int] == PaimonFormat.Kind.Add &&
            !deleted.contains(e.get("fileName").toString))
        PaimonFormat.writeManifest(s"$mdir/$merged", live)
        Seq(merged)
      }
    }

    val deltaName = s"manifest-${UUID.randomUUID()}"
    val entries =
      pendingAdds.toSeq.flatMap(_.toLocalIterator().asScala)
        .map(toEntry(_, PaimonFormat.Kind.Add)) ++
      pendingRemoves.toSeq.flatMap(_.toLocalIterator().asScala)
        .map(toEntry(_, PaimonFormat.Kind.Delete))
    PaimonFormat.writeManifest(s"$mdir/$deltaName", entries.iterator)

    val baseListName = s"manifest-list-${UUID.randomUUID()}-base"
    val deltaListName = s"manifest-list-${UUID.randomUUID()}-delta"
    PaimonFormat.writeManifestList(s"$mdir/$baseListName",
      base.map(n => (n, new java.io.File(s"$mdir/$n").length())))
    PaimonFormat.writeManifestList(s"$mdir/$deltaListName",
      Seq((deltaName, new java.io.File(s"$mdir/$deltaName").length())))

    val hasDeletes = pendingRemoves.exists(!_.isEmpty)
    val ok = PaimonFormat.writeSnapshot(tablePath, PaimonFormat.PaimonSnapshot(
      id, 0L, if (hasDeletes) "COMPACT" else "APPEND",
      System.currentTimeMillis(),
      s"$mdir/$deltaListName", s"$mdir/$baseListName",
      syncMeta.map(_.toJson)))
    if (!ok) throw new IllegalStateException(
      s"concurrent writer committed snapshot $id first at $tablePath")
  }

  override def tableMetadata(): Option[SyncMetadata] =
    PaimonFormat.latestSnapshotId(tablePath)
      .flatMap(id => PaimonFormat.readSnapshot(tablePath, id).graftMetadata)
      .flatMap(SyncMetadata.fromJson)
}
