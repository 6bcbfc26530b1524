package graft.sync

import graft.model._
import graft.spi._

/** The per-target sync protocol — reference TableFormatSync.java:153-188,
  * fixed call order: beginSync → syncMetadata → syncSchema →
  * syncPartitionSpec → syncFiles → completeSync.
  */
object TableFormatSync {

  def syncSnapshot(targets: Seq[ConversionTarget], snapshot: TableSnapshot,
      sourceFormat: String): Seq[SyncOutcome] =
    targets.map { target =>
      val t0 = System.currentTimeMillis()
      try {
        val meta = SyncMetadata(snapshot.commitId, snapshot.pendingCommits,
          sourceFormat, snapshot.table.basePath)
        target.beginSync(snapshot.table)
        target.syncMetadata(meta)
        target.syncSchema(snapshot.table.schema)
        target.syncPartitionSpec(snapshot.table.partitionFields)
        target.syncFilesForSnapshot(snapshot.files)
        target.completeSync()
        SyncOutcome(target.targetFormat, SyncMode.Full, "SUCCESS",
          snapshot.commitId, System.currentTimeMillis() - t0)
      } catch {
        case e: Exception =>
          SyncOutcome(target.targetFormat, SyncMode.Full, "ERROR",
            snapshot.commitId, System.currentTimeMillis() - t0,
            Some(e.toString))
      }
    }

  /** Incremental path: one pass over the change iterator, applied to every
    * target in lock-step; targets whose metadata already covers a change
    * skip it (reference TableFormatSync.java:99-151).
    */
  def syncChanges(targetsWithMeta: Seq[(ConversionTarget, Option[SyncMetadata])],
      changes: Iterator[TableChange], sourceFormat: String,
      pendingCommits: Seq[String]): Seq[SyncOutcome] = {
    val t0 = System.currentTimeMillis()
    var outcomes = targetsWithMeta.map { case (t, m) =>
      t -> (m.map(_.lastInstantSynced), Option.empty[String])
    }.toMap
    var lastApplied = Map.empty[ConversionTarget, String]

    for (change <- changes) {
      for ((target, meta) <- targetsWithMeta) {
        val (lastSynced, err) = outcomes(target)
        val applicable = err.isEmpty &&
          lastSynced.forall(ls => isBefore(ls, change.commitId))
        if (applicable) {
          try {
            val syncMeta = SyncMetadata(change.commitId, pendingCommits,
              sourceFormat, change.tableAsOfChange.basePath)
            target.beginSync(change.tableAsOfChange)
            target.syncMetadata(syncMeta)
            target.syncSchema(change.tableAsOfChange.schema)
            target.syncPartitionSpec(change.tableAsOfChange.partitionFields)
            target.syncFilesForDiff(change.diff)
            target.completeSync()
            lastApplied += target -> change.commitId
            outcomes += target -> (Some(change.commitId), None)
          } catch {
            case e: Exception =>
              outcomes += target -> (lastSynced, Some(e.toString))
          }
        }
      }
    }
    targetsWithMeta.map { case (target, meta) =>
      val (last, err) = outcomes(target)
      SyncOutcome(target.targetFormat, SyncMode.Incremental,
        if (err.isEmpty) "SUCCESS" else "ERROR",
        last.getOrElse(meta.map(_.lastInstantSynced).getOrElse("")),
        System.currentTimeMillis() - t0, err)
    }
  }

  /** Commit ids order numerically when both are numeric, else lexically
    * (all built-in sources use numeric ids: Delta version, parquet mtime,
    * Hudi instant yyyyMMddHHmmssSSS, Iceberg sequence number).
    */
  def isBefore(a: String, b: String): Boolean =
    if (a.forall(_.isDigit) && b.forall(_.isDigit))
      (try BigInt(a) < BigInt(b) catch { case _: Exception => a < b })
    else a < b
}
