package graft.catalog

/** Fully-qualified catalog table identity (reference
  * CatalogTableIdentifier.java). Names are normalized to the
  * [A-Za-z0-9_] alphabet both Glue and HMS enforce.
  */
case class CatalogTableIdentifier(database: String, table: String) {
  def normalized: CatalogTableIdentifier = CatalogTableIdentifier(
    CatalogTableIdentifier.normalize(database),
    CatalogTableIdentifier.normalize(table))
  def fqName: String = s"$database.$table"
}

object CatalogTableIdentifier {
  def normalize(name: String): String = name.replaceAll("[^A-Za-z0-9_]", "_")
}

/** A catalog's storage-descriptor view of a table — the translation each
  * per-format builder produces (reference IcebergGlueCatalogTableBuilder /
  * DeltaHMSCatalogTableBuilder et al.): where the data lives, how a Hive
  * reader would open it, and the properties engines key on.
  */
case class CatalogTableDef(
    identifier: CatalogTableIdentifier,
    location: String,
    tableFormat: String,                     // DELTA | ICEBERG | HUDI | ...
    columns: Seq[(String, String)],          // (name, hive type)
    partitionColumns: Seq[(String, String)],
    inputFormat: String,
    outputFormat: String,
    serde: String,
    properties: Map[String, String])

/** One Hive-style partition: values in partition-column order + location. */
case class CatalogPartition(values: Seq[String], location: String)

/** Catalog sink SPI — reference CatalogSyncClient.java (implemented there
  * by GlueCatalogSyncClient.java and HMSCatalogSyncClient.java): the
  * lifecycle a conversion ends with, so converted tables resolve by NAME in
  * whatever catalog the organization runs. Semantics:
  *
  *  - createTable fails if the table exists (the catalog is the authority);
  *  - createOrReplaceTable is the recovery path for a divergent entry;
  *  - refreshTable updates schema/properties in place, preserving identity;
  *  - partition registration is explicit add/drop (HMS add_partitions /
  *    drop_partitions), NOT a full relisting — at 10^5 partitions a relist
  *    per sync is the scale-killer MSCK REPAIR has.
  */
trait CatalogSyncClient {
  def catalogName: String
  def hasDatabase(db: String): Boolean
  def createDatabase(db: String): Unit
  def getTable(id: CatalogTableIdentifier): Option[CatalogTableDef]
  def createTable(table: CatalogTableDef): Unit
  def refreshTable(table: CatalogTableDef): Unit
  def createOrReplaceTable(table: CatalogTableDef): Unit
  def dropTable(id: CatalogTableIdentifier): Unit
  def listPartitions(id: CatalogTableIdentifier): Seq[CatalogPartition]
  def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit
  def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit
}

/** In-process HMS-shaped catalog: the metastore contract (thread-safe,
  * create-fails-if-exists, explicit partition add/drop) without a network
  * service — no Glue/HMS endpoint exists in this environment, so the SPI is
  * exercised against the same semantics in memory (mirroring
  * HMSCatalogSyncClient.java behavior for each call).
  */
class InMemoryHmsCatalogClient(override val catalogName: String = "hms")
  extends CatalogSyncClient {

  private val databases = scala.collection.mutable.Set.empty[String]
  private val tables =
    scala.collection.mutable.Map.empty[String, CatalogTableDef]
  private val partitions =
    scala.collection.mutable.Map.empty[String, Map[Seq[String], CatalogPartition]]

  private def key(id: CatalogTableIdentifier) = id.normalized.fqName

  override def hasDatabase(db: String): Boolean = synchronized {
    databases.contains(CatalogTableIdentifier.normalize(db))
  }

  override def createDatabase(db: String): Unit = synchronized {
    databases += CatalogTableIdentifier.normalize(db)
  }

  override def getTable(id: CatalogTableIdentifier): Option[CatalogTableDef] =
    synchronized { tables.get(key(id)) }

  override def createTable(table: CatalogTableDef): Unit = synchronized {
    val k = key(table.identifier)
    require(databases.contains(table.identifier.normalized.database),
      s"no database ${table.identifier.database}")
    if (tables.contains(k))
      throw new IllegalStateException(s"table $k already exists")
    tables(k) = table
    partitions.getOrElseUpdate(k, Map.empty)
  }

  override def refreshTable(table: CatalogTableDef): Unit = synchronized {
    val k = key(table.identifier)
    if (!tables.contains(k))
      throw new IllegalStateException(s"no table $k to refresh")
    tables(k) = table
  }

  override def createOrReplaceTable(table: CatalogTableDef): Unit =
    synchronized {
      if (!hasDatabase(table.identifier.database))
        createDatabase(table.identifier.database)
      tables(key(table.identifier)) = table
      partitions.getOrElseUpdate(key(table.identifier), Map.empty)
    }

  override def dropTable(id: CatalogTableIdentifier): Unit = synchronized {
    tables.remove(key(id)); partitions.remove(key(id))
  }

  override def listPartitions(id: CatalogTableIdentifier)
      : Seq[CatalogPartition] = synchronized {
    partitions.getOrElse(key(id), Map.empty).values.toSeq
      .sortBy(_.values.mkString("/"))
  }

  override def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit = synchronized {
    val k = key(id)
    val cur = partitions.getOrElse(k, Map.empty)
    partitions(k) = cur ++ parts.map(p => p.values -> p)
  }

  override def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit = synchronized {
    val k = key(id)
    partitions(k) = partitions.getOrElse(k, Map.empty) -- values
  }
}
