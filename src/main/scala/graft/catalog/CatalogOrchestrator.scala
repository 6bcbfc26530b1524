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
    // identity flows RAW: naming rules are per-catalog (Glue/HMS coerce
    // to their [A-Za-z0-9_] alphabet inside their clients; REST keeps
    // arbitrary identifiers and percent-encodes on the wire)
    val desired = CatalogTableBuilders.forTable(
      id, table, targetFormat, metadataLocation)
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

  /** Glue's BatchCreatePartition caps at 100 partitions per call; HMS
    * add_partitions degrades on huge lists too. Registration is chunked to
    * this size so a 10⁵-partition table is many bounded calls, not one.
    */
  val PartitionBatchSize = 100

  /** Explicit partition diff (add new, drop gone) — never a full relist.
    * Adds and drops go through the client in `PartitionBatchSize` chunks;
    * a failing chunk doesn't abort the rest (the catalog keeps every
    * batch that succeeded), and the failures surface as one aggregate
    * error naming the failed chunks.
    */
  private def syncPartitions(c: CatalogSyncClient, id: CatalogTableIdentifier,
      desired: Seq[CatalogPartition]): Unit = {
    if (desired.isEmpty) return
    val current = c.listPartitions(id).map(p => p.values -> p).toMap
    val want = desired.map(p => p.values -> p).toMap
    val toAdd = desired.filterNot(p => current.contains(p.values))
    val toDrop = current.keys.filterNot(want.contains).toSeq
    val errors = Seq.newBuilder[String]
    toAdd.grouped(PartitionBatchSize).zipWithIndex.foreach { case (batch, i) =>
      try c.addPartitions(id, batch)
      catch { case e: Exception =>
        errors += s"add batch $i (${batch.size} partitions): $e"
      }
    }
    toDrop.grouped(PartitionBatchSize).zipWithIndex.foreach { case (batch, i) =>
      try c.dropPartitions(id, batch)
      catch { case e: Exception =>
        errors += s"drop batch $i (${batch.size} partitions): $e"
      }
    }
    val errs = errors.result()
    if (errs.nonEmpty) throw new IllegalStateException(
      s"${errs.size} partition batch(es) failed for ${id.fqName}: " +
        errs.mkString("; "))
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
