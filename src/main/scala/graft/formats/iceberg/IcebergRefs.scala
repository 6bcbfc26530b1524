package graft.formats.iceberg

import org.apache.spark.sql.SparkSession

/** Snapshot references and history surgery for Iceberg tables: named
  * branches/tags (spec v2 `refs`) and ROLLBACK — the state-management ops
  * a production table runs alongside time travel.
  *
  * All of these are metadata-only: one new `v<N+1>.metadata.json` whose
  * CAS (create-if-absent publish + version-hint update) refuses a
  * concurrent writer, exactly like every other graft Iceberg commit. No
  * data or manifest file is touched, so they are O(1) regardless of
  * table size.
  */
object IcebergRefs {

  private def headMeta(tablePath: String): (Long, IcebergTableMetadata) = {
    val v = IcebergMetadata.currentVersion(tablePath).getOrElse(
      throw new IllegalStateException(s"no Iceberg table at $tablePath"))
    (v, IcebergMetadata.read(tablePath, v))
  }

  private def commit(tablePath: String, v: Long, m: IcebergTableMetadata)
      : Unit = {
    val ok = IcebergMetadata.write(tablePath, v + 1,
      m.copy(lastUpdatedMs = System.currentTimeMillis()))
    if (!ok) throw new IllegalStateException(
      s"concurrent writer committed metadata v${v + 1} first at $tablePath")
  }

  /** Create (or move, for a branch) a named ref at `atSeq`'s snapshot —
    * head when omitted. Tags are immutable: re-pointing an existing tag
    * refuses.
    */
  def createRef(spark: SparkSession, tablePath: String, name: String,
      refType: String, atSeq: Option[Long] = None): Unit = {
    require(name != "main", "`main` is the implicit head branch")
    val (v, m) = headMeta(tablePath)
    val snap = atSeq match {
      case Some(seq) => m.snapshotBySeq(seq).getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot at sequence $seq in $tablePath"))
      case None => m.currentSnapshot.getOrElse(
        throw new IllegalStateException(s"$tablePath has no snapshots"))
    }
    m.refs.get(name).foreach { existing =>
      require(existing.refType == "branch" && refType == "branch",
        s"ref $name already exists as a ${existing.refType} — tags are " +
          "immutable; drop it first")
    }
    commit(tablePath, v,
      m.copy(refs = m.refs + (name -> IcebergRef(snap.snapshotId, refType))))
  }

  def createTag(spark: SparkSession, tablePath: String, name: String,
      atSeq: Option[Long] = None): Unit =
    createRef(spark, tablePath, name, "tag", atSeq)

  def createBranch(spark: SparkSession, tablePath: String, name: String,
      atSeq: Option[Long] = None): Unit =
    createRef(spark, tablePath, name, "branch", atSeq)

  def dropRef(spark: SparkSession, tablePath: String, name: String): Unit = {
    val (v, m) = headMeta(tablePath)
    require(m.refs.contains(name), s"no ref $name in $tablePath")
    commit(tablePath, v, m.copy(refs = m.refs - name))
  }

  /** The sequence number a named ref points at (`main` = head). */
  def resolve(m: IcebergTableMetadata, name: String): Long = {
    val ref = m.refNamed(name).getOrElse(
      throw new IllegalArgumentException(s"no ref named $name"))
    m.snapshots.find(_.snapshotId == ref.snapshotId).map(_.sequenceNumber)
      .getOrElse(throw new IllegalStateException(
        s"ref $name points at expired snapshot ${ref.snapshotId}"))
  }

  /** Write-audit-publish PUBLISH: fast-forward the main head to the
    * named branch's snapshot. Requires main's current head to be an
    * ANCESTOR of the branch head (walking `parent-snapshot-id`) — a
    * diverged main means the branch must be rebased, and forcing the
    * move would silently drop main's commits. Returns the published
    * snapshot's sequence number.
    */
  def fastForward(spark: SparkSession, tablePath: String, branch: String)
      : Long = {
    val (v, m) = headMeta(tablePath)
    val ref = m.refs.getOrElse(branch, throw new IllegalArgumentException(
      s"no ref '$branch' at $tablePath"))
    require(ref.refType == "branch",
      s"ref '$branch' is a ${ref.refType}, not a branch")
    val target = m.snapshots.find(_.snapshotId == ref.snapshotId).getOrElse(
      throw new IllegalStateException(
        s"branch '$branch' points at expired snapshot ${ref.snapshotId}"))
    m.currentSnapshot.foreach { head =>
      var cur: Option[IcebergSnapshot] = Some(target)
      var found = head.snapshotId == target.snapshotId
      while (!found && cur.isDefined) {
        cur = cur.get.parentSnapshotId
          .flatMap(p => m.snapshots.find(_.snapshotId == p))
        found = cur.exists(_.snapshotId == head.snapshotId)
      }
      require(found,
        s"main's head ${head.snapshotId} is not an ancestor of branch " +
          s"'$branch' (${target.snapshotId}) — not a fast-forward; " +
          "rebase the branch or roll main back first")
    }
    commit(tablePath, v, m.copy(currentSnapshotId = target.snapshotId))
    target.sequenceNumber
  }

  /** ROLLBACK the head to the snapshot at `seq`. History and refs are
    * preserved (the abandoned snapshots stay until expiration); future
    * commits continue from a fresh sequence number, so incremental
    * consumers see rollback as a new state, never a rewound clock.
    */
  def rollbackTo(spark: SparkSession, tablePath: String, seq: Long)
      : Unit = {
    val (v, m) = headMeta(tablePath)
    val snap = m.snapshotBySeq(seq).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot at sequence $seq in $tablePath (expired?)"))
    commit(tablePath, v, m.copy(currentSnapshotId = snap.snapshotId))
  }
}
