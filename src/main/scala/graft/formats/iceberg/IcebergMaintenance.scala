package graft.formats.iceberg

/** Iceberg table maintenance — snapshot expiration (the ExpireSnapshots
  * action every production Iceberg table runs). Old snapshot entries are
  * dropped from the metadata under a fresh version; data/manifest files
  * are left in place (physical cleanup is a separate concern — the
  * reference's expiration-safety check on the SOURCE side,
  * IcebergConversionSource isIncrementalSyncSafeFrom, is what this
  * exercises: an expired snapshot makes per-commit replay impossible and
  * must force fallback-to-full).
  */
object IcebergMaintenance {

  /** Drop all but the newest `retainLast` snapshots. Returns the expired
    * sequence numbers (empty when under the window).
    */
  def expireSnapshots(tablePath: String, retainLast: Int): Seq[Long] = {
    require(retainLast >= 1, "must retain at least one snapshot")
    val version = IcebergMetadata.currentVersion(tablePath).getOrElse(
      throw new IllegalStateException(s"no Iceberg table at $tablePath"))
    val m = IcebergMetadata.read(tablePath, version)
    val ordered = m.snapshots.sortBy(_.sequenceNumber)
    if (ordered.size <= retainLast) return Nil
    val (expired, kept) = ordered.splitAt(ordered.size - retainLast)
    val ok = IcebergMetadata.write(tablePath, version + 1, m.copy(
      snapshots = kept,
      lastUpdatedMs = System.currentTimeMillis()))
    if (!ok) throw new IllegalStateException(
      s"concurrent writer during snapshot expiration at $tablePath")
    expired.map(_.sequenceNumber)
  }
}
