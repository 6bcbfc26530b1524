package graft.spi

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.types.StructType

import graft.model._
import graft.util.Jsons

/** Source SPI — reference ConversionSource.java:37-106. Commits are opaque
  * strings ordered by the source (Delta: version number; Hudi: instant
  * timestamp; Parquet-dir: mtime; Iceberg: snapshot id via sequence order).
  */
trait ConversionSource {
  def sourceFormat: String
  def currentTable(): TableDescriptor
  def currentSnapshot(): TableSnapshot
  def changeForCommit(commit: String): TableChange
  /** Commits strictly after `lastSynced`, oldest first. */
  def commitsBacklog(lastSynced: String): Seq[String]
  def isIncrementalSyncSafeFrom(commit: String): Boolean
}

/** Target SPI — reference ConversionTarget.java:36-105. The sync protocol
  * calls these in fixed order (TableFormatSync.java:162-179):
  * beginSync → syncMetadata → syncSchema → syncPartitionSpec → syncFiles →
  * completeSync.
  */
trait ConversionTarget {
  def targetFormat: String
  def beginSync(table: TableDescriptor): Unit
  def syncMetadata(meta: SyncMetadata): Unit
  def syncSchema(schema: StructType): Unit
  def syncPartitionSpec(spec: Seq[PartitionFieldSpec]): Unit
  def syncFilesForSnapshot(files: Dataset[FileEntry]): Unit
  def syncFilesForDiff(diff: FilesDelta): Unit
  /** CAS pin for read-modify-write full-set syncs (compaction,
    * clustering, ALTER TABLE): the caller planned its file set against
    * the target's snapshot `commitId`, and `completeSync` must FAIL
    * loudly — never silently rebase — if another writer advanced the
    * table past it. Otherwise a concurrent append landing between
    * planning and commit is diffed away as removes (row loss), and a
    * concurrent delete's rows are resurrected by the rewritten victims.
    * No-op default: plain snapshot syncs tolerate rebasing (the diff is
    * recomputed against the live head inside the protocol).
    */
  def expectBaseCommit(commitId: String): Unit = ()
  def completeSync(): Unit
  /** Sync bookkeeping read back from the target's own metadata (in-band
    * checkpoint — reference TableSyncMetadata stored in table properties).
    */
  def tableMetadata(): Option[SyncMetadata]
}

/** Reference TableSyncMetadata.java:43-100 — serialized as JSON into the
  * target table's properties under the XTABLE_METADATA-equivalent key.
  */
case class SyncMetadata(
    lastInstantSynced: String,
    pendingCommits: Seq[String],
    sourceFormat: String,
    sourceIdentifier: String,
    version: Int = SyncMetadata.CurrentVersion) {
  def toJson: String = Jsons.toJson(Map(
    "lastInstantSynced" -> lastInstantSynced,
    "pendingCommits" -> pendingCommits,
    "sourceFormat" -> sourceFormat,
    "sourceIdentifier" -> sourceIdentifier,
    "version" -> version))
}

object SyncMetadata {
  val CurrentVersion = 1
  val PropertyKey = "GRAFT_METADATA"

  def fromJson(json: String): Option[SyncMetadata] =
    scala.util.Try {
      val m = Jsons.parseMap(json)
      SyncMetadata(
        m("lastInstantSynced").toString,
        m.getOrElse("pendingCommits", Nil) match {
          case s: Seq[_] => s.map(_.toString)
          case _ => Nil
        },
        m.getOrElse("sourceFormat", "").toString,
        m.getOrElse("sourceIdentifier", "").toString,
        m.getOrElse("version", 1).toString.toInt)
    }.toOption
}

/** Reference SyncResult.java:42-70. */
case class SyncOutcome(
    targetFormat: String,
    mode: String,                   // FULL | INCREMENTAL
    status: String,                 // SUCCESS | ERROR
    lastInstantSynced: String,
    durationMillis: Long,
    error: Option[String] = None)

object SyncMode {
  val Full = "FULL"; val Incremental = "INCREMENTAL"
}
