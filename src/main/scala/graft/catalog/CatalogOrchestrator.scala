package graft.catalog

import org.apache.spark.sql.SparkSession

import graft.model.{TableDescriptor, TableSnapshot}

/** Catalog registration pass over N catalog clients — reference
  * CatalogSync.java:52-85: each client is synced independently, failures
  * are per-catalog outcomes, and the decision per table is
  * create / refresh / replace-if-diverged.
  */
object CatalogOrchestrator {

  case class CatalogOutcome(catalog: String, table: String, status: String,
      error: Option[String] = None)

  /** Register/refresh `table` in every client.
    *
    * Divergence rule (reference CatalogSyncOperations): an existing entry
    * pointing at a different location or format is replaced wholesale;
    * a matching entry is refreshed in place (schema/property updates keep
    * table identity, grants, and downstream references intact).
    */
  def syncTable(clients: Seq[CatalogSyncClient], id: CatalogTableIdentifier,
      table: TableDescriptor, targetFormat: String,
      metadataLocation: Option[String] = None,
      partitions: Seq[CatalogPartition] = Nil): Seq[CatalogOutcome] = {
    val desired = CatalogTableBuilders.forTable(
      id.normalized, table, targetFormat, metadataLocation)
    clients.map { c =>
      try {
        if (!c.hasDatabase(id.database)) c.createDatabase(id.database)
        c.getTable(id) match {
          case None => c.createTable(desired)
          case Some(existing)
              if existing.location != desired.location ||
                existing.tableFormat != desired.tableFormat =>
            c.createOrReplaceTable(desired)
          case Some(_) => c.refreshTable(desired)
        }
        syncPartitions(c, id, partitions)
        CatalogOutcome(c.catalogName, id.fqName, "SUCCESS")
      } catch {
        case e: Exception =>
          CatalogOutcome(c.catalogName, id.fqName, "ERROR", Some(e.toString))
      }
    }
  }

  /** Explicit partition diff (add new, drop gone) — never a full relist. */
  private def syncPartitions(c: CatalogSyncClient, id: CatalogTableIdentifier,
      desired: Seq[CatalogPartition]): Unit = {
    if (desired.isEmpty) return
    val current = c.listPartitions(id).map(p => p.values -> p).toMap
    val want = desired.map(p => p.values -> p).toMap
    val toAdd = desired.filterNot(p => current.contains(p.values))
    val toDrop = current.keys.filterNot(want.contains).toSeq
    if (toAdd.nonEmpty) c.addPartitions(id, toAdd)
    if (toDrop.nonEmpty) c.dropPartitions(id, toDrop)
  }

  /** The table's Hive partitions from a snapshot's file listing: a
    * distributed distinct over (partitionValues, dir) — collects one row
    * per PARTITION, never per file.
    */
  def partitionsOf(spark: SparkSession, snap: TableSnapshot)
      : Seq[CatalogPartition] = {
    if (snap.table.partitionFields.isEmpty) return Nil
    val order = snap.table.partitionFields.map(_.partitionColumnName)
    import spark.implicits._
    snap.files
      .map { f =>
        val byName = f.partitionValues.map(m => m.field -> m.value).toMap
        (order.map(n => byName.getOrElse(n, "")),
          f.path.substring(0, f.path.lastIndexOf('/')))
      }
      .distinct()
      .collect()
      .toSeq
      .map { case (values, loc) => CatalogPartition(values, loc) }
      .sortBy(_.values.mkString("/"))
  }
}
