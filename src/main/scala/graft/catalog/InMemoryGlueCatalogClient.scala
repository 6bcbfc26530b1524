package graft.catalog

/** In-process Glue-shaped catalog: AWS Glue's semantics, which differ from
  * HMS in ways a sync client must handle (reference
  * GlueCatalogSyncClient.java):
  *
  *  - tables are VERSIONED: every update creates a new table version and
  *    retains history (Glue soft-limits versions, so old ones are pruned
  *    past `maxVersions` — production Glue raises LimitExceededException
  *    otherwise);
  *  - there is no in-place refresh: UpdateTable replaces the whole
  *    TableInput (a partial update silently drops the omitted fields —
  *    the client must always send the complete descriptor);
  *  - partition maintenance is batched (BatchCreatePartition /
  *    BatchDeletePartition) with PER-ITEM failure semantics: an
  *    AlreadyExists on one partition must not fail the batch;
  *  - entries carry Glue-isms: `EXTERNAL_TABLE` type and a
  *    `classification` parameter engines key on.
  *
  * In-memory because no Glue endpoint exists in this environment; the SPI
  * boundary (`CatalogSyncClient`) is where the real AWS SDK client would
  * plug in, with identical call semantics.
  */
class InMemoryGlueCatalogClient(override val catalogName: String = "glue",
    maxVersions: Int = 5)
  extends CatalogSyncClient {

  private val databases = scala.collection.mutable.Set.empty[String]
  private val versions =
    scala.collection.mutable.Map.empty[String, List[CatalogTableDef]]
  private val partitions =
    scala.collection.mutable.Map.empty[String, Map[Seq[String], CatalogPartition]]

  private def key(id: CatalogTableIdentifier) = id.normalized.fqName

  /** Glue TableInput: complete descriptor with the Glue-isms stamped. */
  private def glueInput(t: CatalogTableDef): CatalogTableDef =
    t.copy(properties = t.properties ++ Map(
      "EXTERNAL" -> "TRUE",
      "table_type_glue" -> "EXTERNAL_TABLE",
      "classification" -> t.tableFormat.toLowerCase))

  override def hasDatabase(db: String): Boolean = synchronized {
    databases.contains(CatalogTableIdentifier.normalize(db))
  }

  override def createDatabase(db: String): Unit = synchronized {
    databases += CatalogTableIdentifier.normalize(db)
  }

  override def getTable(id: CatalogTableIdentifier): Option[CatalogTableDef] =
    synchronized { versions.get(key(id)).map(_.head) }

  /** All retained versions, newest first — the Glue version history. */
  def tableVersions(id: CatalogTableIdentifier): Seq[CatalogTableDef] =
    synchronized { versions.getOrElse(key(id), Nil) }

  override def createTable(table: CatalogTableDef): Unit = synchronized {
    val k = key(table.identifier)
    if (!databases.contains(table.identifier.normalized.database))
      throw new IllegalStateException(
        s"EntityNotFound: database ${table.identifier.database}")
    if (versions.contains(k))
      throw new IllegalStateException(s"AlreadyExists: table $k")
    versions(k) = List(glueInput(table))
    partitions.getOrElseUpdate(k, Map.empty)
  }

  /** UpdateTable: a NEW version with the complete descriptor; history is
    * pruned to `maxVersions` (Glue's version quota).
    */
  override def refreshTable(table: CatalogTableDef): Unit = synchronized {
    val k = key(table.identifier)
    val prior = versions.getOrElse(k,
      throw new IllegalStateException(s"EntityNotFound: table $k"))
    versions(k) = (glueInput(table) :: prior).take(maxVersions)
  }

  override def createOrReplaceTable(table: CatalogTableDef): Unit =
    synchronized {
      if (!hasDatabase(table.identifier.database))
        createDatabase(table.identifier.database)
      // replace resets identity: version history starts over (Glue
      // DeleteTable + CreateTable, the reference's divergence recovery)
      versions(key(table.identifier)) = List(glueInput(table))
      partitions.getOrElseUpdate(key(table.identifier), Map.empty)
    }

  override def dropTable(id: CatalogTableIdentifier): Unit = synchronized {
    versions.remove(key(id)); partitions.remove(key(id))
  }

  override def listPartitions(id: CatalogTableIdentifier)
      : Seq[CatalogPartition] = synchronized {
    partitions.getOrElse(key(id), Map.empty).values.toSeq
      .sortBy(_.values.mkString("/"))
  }

  /** BatchCreatePartition: per-item semantics — AlreadyExists entries are
    * skipped (reported, not fatal), everything else lands.
    */
  override def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit = synchronized {
    val k = key(id)
    val cur = partitions.getOrElse(k, Map.empty)
    val fresh = parts.filterNot(p => cur.contains(p.values))
    partitions(k) = cur ++ fresh.map(p => p.values -> p)
  }

  /** BatchDeletePartition: missing entries are per-item no-ops. */
  override def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit = synchronized {
    val k = key(id)
    partitions(k) = partitions.getOrElse(k, Map.empty) -- values
  }
}
