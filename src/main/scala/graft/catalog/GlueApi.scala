package graft.catalog

/** The Glue WIRE surface — one method per AWS Glue operation the sync
  * client calls, request/response shapes mirroring
  * `software.amazon.awssdk.services.glue` 1:1 (reference client:
  * `xtable-aws/.../glue/GlueCatalogSyncClient.java`), so a production
  * adapter is a mechanical delegation:
  *
  *  - `getDatabase(name)`        → `GetDatabaseRequest(name)`; None on
  *    `EntityNotFoundException`
  *  - `createDatabase(name)`     → `CreateDatabaseRequest(DatabaseInput)`
  *  - `getTable(db, t)`          → `GetTableRequest`; None on
  *    `EntityNotFoundException`
  *  - `createTable(db, input)`   → `CreateTableRequest(TableInput)`;
  *    throws on `AlreadyExistsException`
  *  - `updateTable(db, input)`   → `UpdateTableRequest(TableInput)` — Glue
  *    replaces the WHOLE TableInput and records a new table version
  *  - `deleteTable(db, t)`       → `DeleteTableRequest`
  *  - `tableVersionIds(db, t)`   → `GetTableVersionsRequest` (paged)
  *  - `deleteTableVersions(...)` → `BatchDeleteTableVersionRequest`
  *  - `getPartitions(db, t)`     → `GetPartitionsRequest` (paged)
  *  - `batchCreatePartition(..)` → `BatchCreatePartitionRequest`;
  *    returns PER-ITEM errors (`partitionErrors`), never throws on
  *    `AlreadyExistsException` entries
  *  - `batchDeletePartition(..)` → `BatchDeletePartitionRequest`;
  *    missing entries are per-item errors, not failures
  *
  * The AWS SDK resolves nothing in this offline build, so the SDK
  * adapter lives in a deployment module — the checked-in, compile-
  * excluded delegation source is
  * `deploy/glue-adapter/src/main/scala/graft/catalog/AwsSdkGlueApi.scala`
  * (wiring in `deploy/glue-adapter/README.md`); every semantic above
  * this interface ([[GlueCatalogSyncClient]]) is identical either way
  * and is what the tests pin.
  */
trait GlueApi {
  def getDatabase(name: String): Option[String]
  def createDatabase(name: String): Unit
  def getTable(db: String, table: String): Option[GlueTableInput]
  def createTable(db: String, input: GlueTableInput): Unit
  def updateTable(db: String, input: GlueTableInput): Unit
  def deleteTable(db: String, table: String): Unit
  /** Retained version ids, newest first. */
  def tableVersionIds(db: String, table: String): Seq[String]
  def deleteTableVersions(db: String, table: String,
      versionIds: Seq[String]): Unit
  def getPartitions(db: String, table: String): Seq[GluePartitionInput]
  /** Returns the values of entries that FAILED per-item (already
    * exists, validation): the batch itself never throws for them.
    */
  def batchCreatePartition(db: String, table: String,
      parts: Seq[GluePartitionInput]): Seq[Seq[String]]
  def batchDeletePartition(db: String, table: String,
      values: Seq[Seq[String]]): Seq[Seq[String]]
}

/** Glue's TableInput shape (complete descriptor — UpdateTable replaces
  * all of it; a partial input silently DROPS omitted fields).
  */
case class GlueTableInput(
    name: String,
    tableType: String,                       // EXTERNAL_TABLE
    parameters: Map[String, String],
    location: String,
    inputFormat: String,
    outputFormat: String,
    serde: String,
    columns: Seq[(String, String)],
    partitionKeys: Seq[(String, String)])

/** Glue's PartitionInput shape. */
case class GluePartitionInput(values: Seq[String], location: String)

/** Glue sync SEMANTICS over any [[GlueApi]] wire — the layer the
  * reference implements in `GlueCatalogSyncClient.java`, identical over
  * the in-memory twin and a real SDK adapter:
  *
  *  - every update sends the COMPLETE TableInput (Glue's replace-all
  *    update rule);
  *  - version history is pruned to `maxVersions` after updates
  *    (production Glue raises `LimitExceededException` past the table
  *    version quota otherwise);
  *  - create-or-replace resets identity via DeleteTable + CreateTable
  *    (the reference's divergence recovery);
  *  - partition maintenance is batched with per-item failure isolation;
  *  - Glue-isms stamped on every descriptor: `EXTERNAL_TABLE` type and
  *    the `classification` parameter engines key on.
  */
class GlueCatalogSyncClient(api: GlueApi,
    override val catalogName: String = "glue", maxVersions: Int = 5)
  extends CatalogSyncClient {

  private def glueInput(t: CatalogTableDef): GlueTableInput =
    GlueTableInput(
      t.identifier.normalized.table,
      "EXTERNAL_TABLE",
      t.properties ++ Map(
        "EXTERNAL" -> "TRUE",
        "table_type_glue" -> "EXTERNAL_TABLE",
        "classification" -> t.tableFormat.toLowerCase),
      t.location, t.inputFormat, t.outputFormat, t.serde,
      t.columns, t.partitionColumns)

  private def db(id: CatalogTableIdentifier): String =
    id.normalized.database
  private def tbl(id: CatalogTableIdentifier): String =
    id.normalized.table

  override def hasDatabase(name: String): Boolean =
    api.getDatabase(CatalogTableIdentifier.normalize(name)).isDefined

  override def createDatabase(name: String): Unit =
    api.createDatabase(CatalogTableIdentifier.normalize(name))

  override def getTable(id: CatalogTableIdentifier)
      : Option[CatalogTableDef] =
    api.getTable(db(id), tbl(id)).map(toDef(id, _))

  protected def toDef(id: CatalogTableIdentifier,
      g: GlueTableInput): CatalogTableDef =
    CatalogTableDef(id.normalized, g.location,
      g.parameters.getOrElse("classification", "parquet").toUpperCase,
      g.columns, g.partitionKeys, g.inputFormat, g.outputFormat, g.serde,
      g.parameters)

  override def createTable(table: CatalogTableDef): Unit =
    api.createTable(db(table.identifier), glueInput(table))

  /** UpdateTable with the complete descriptor, then prune the version
    * history to the quota.
    */
  override def refreshTable(table: CatalogTableDef): Unit = {
    val d = db(table.identifier); val t = tbl(table.identifier)
    api.updateTable(d, glueInput(table))
    val ids = api.tableVersionIds(d, t)
    if (ids.size > maxVersions)
      api.deleteTableVersions(d, t, ids.drop(maxVersions))
  }

  override def createOrReplaceTable(table: CatalogTableDef): Unit = {
    if (!hasDatabase(table.identifier.database))
      createDatabase(table.identifier.database)
    val d = db(table.identifier); val t = tbl(table.identifier)
    if (api.getTable(d, t).isDefined) api.deleteTable(d, t)
    api.createTable(d, glueInput(table))
  }

  override def dropTable(id: CatalogTableIdentifier): Unit =
    api.deleteTable(db(id), tbl(id))

  override def listPartitions(id: CatalogTableIdentifier)
      : Seq[CatalogPartition] =
    api.getPartitions(db(id), tbl(id))
      .map(p => CatalogPartition(p.values, p.location))
      .sortBy(_.values.mkString("/"))

  override def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit = {
    // per-item failure isolation: AlreadyExists entries report, the
    // batch lands the rest
    api.batchCreatePartition(db(id), tbl(id),
      parts.map(p => GluePartitionInput(p.values, p.location)))
    ()
  }

  override def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit = {
    api.batchDeletePartition(db(id), tbl(id), values)
    ()
  }
}

/** In-process Glue wire twin: AWS Glue's versioning and batch-op
  * semantics behind [[GlueApi]]. In-memory because no Glue endpoint
  * exists in this environment; a production deployment swaps in the SDK
  * adapter documented on [[GlueApi]], and everything above the wire is
  * unchanged.
  */
class InMemoryGlueApi extends GlueApi {
  private val databases = scala.collection.mutable.Set.empty[String]
  private val versions = scala.collection.mutable
    .Map.empty[String, List[(String, GlueTableInput)]]   // (versionId, input)
  private val partitions = scala.collection.mutable
    .Map.empty[String, Map[Seq[String], GluePartitionInput]]
  private var versionCounter = 0L

  private def key(db: String, t: String) = s"$db.$t"

  override def getDatabase(name: String): Option[String] = synchronized {
    if (databases.contains(name)) Some(name) else None
  }
  override def createDatabase(name: String): Unit = synchronized {
    databases += name
  }
  override def getTable(db: String, table: String)
      : Option[GlueTableInput] = synchronized {
    versions.get(key(db, table)).map(_.head._2)
  }
  override def createTable(db: String, input: GlueTableInput): Unit =
    synchronized {
      if (!databases.contains(db))
        throw new IllegalStateException(s"EntityNotFound: database $db")
      val k = key(db, input.name)
      if (versions.contains(k))
        throw new IllegalStateException(s"AlreadyExists: table $k")
      versionCounter += 1
      versions(k) = List((versionCounter.toString, input))
      partitions.getOrElseUpdate(k, Map.empty)
    }
  override def updateTable(db: String, input: GlueTableInput): Unit =
    synchronized {
      val k = key(db, input.name)
      val prior = versions.getOrElse(k,
        throw new IllegalStateException(s"EntityNotFound: table $k"))
      versionCounter += 1
      versions(k) = (versionCounter.toString, input) :: prior
    }
  override def deleteTable(db: String, table: String): Unit =
    synchronized {
      versions.remove(key(db, table))
      partitions.remove(key(db, table))
    }
  override def tableVersionIds(db: String, table: String): Seq[String] =
    synchronized { versions.getOrElse(key(db, table), Nil).map(_._1) }
  /** Twin-only introspection: retained TableInputs, newest first. */
  def versionInputs(db: String, table: String): Seq[GlueTableInput] =
    synchronized { versions.getOrElse(key(db, table), Nil).map(_._2) }
  override def deleteTableVersions(db: String, table: String,
      versionIds: Seq[String]): Unit = synchronized {
    val k = key(db, table)
    val drop = versionIds.toSet
    versions.get(k).foreach(v =>
      versions(k) = v.filterNot(e => drop.contains(e._1)))
  }
  override def getPartitions(db: String, table: String)
      : Seq[GluePartitionInput] = synchronized {
    partitions.getOrElse(key(db, table), Map.empty).values.toSeq
  }
  override def batchCreatePartition(db: String, table: String,
      parts: Seq[GluePartitionInput]): Seq[Seq[String]] = synchronized {
    val k = key(db, table)
    val cur = partitions.getOrElse(k, Map.empty)
    val (dup, fresh) = parts.partition(p => cur.contains(p.values))
    partitions(k) = cur ++ fresh.map(p => p.values -> p)
    dup.map(_.values)   // per-item AlreadyExists — reported, not thrown
  }
  override def batchDeletePartition(db: String, table: String,
      values: Seq[Seq[String]]): Seq[Seq[String]] = synchronized {
    val k = key(db, table)
    val cur = partitions.getOrElse(k, Map.empty)
    val missing = values.filterNot(cur.contains)
    partitions(k) = cur -- values
    missing              // per-item EntityNotFound — reported, not thrown
  }
}
