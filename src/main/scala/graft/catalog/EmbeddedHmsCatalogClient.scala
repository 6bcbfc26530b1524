package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.{HiveMetaStoreClient, IMetaStoreClient}
import org.apache.hadoop.hive.metastore.api.{AlreadyExistsException, Database, FieldSchema, NoSuchObjectException, Partition, SerDeInfo, StorageDescriptor, Table}

/** CatalogSyncClient over a REAL Hive metastore, embedded: the actual
  * `IMetaStoreClient` call surface the reference's HMS sink uses
  * (HMSCatalogSyncClient.java:1 — createTable/alter_table/add_partitions/
  * dropPartition against thrift `Table`/`StorageDescriptor`/`Partition`
  * objects), backed by Hive's ObjectStore on an embedded Derby database.
  * No network service exists in this sandbox, so the thrift WIRE hop is
  * elided — but unlike the in-memory twins, every call here round-trips
  * through Hive's metastore object model, schema validation, and a real
  * JDO-persisted catalog, the layer a production HMS deployment runs.
  *
  * JVM-wide singleton store: Hive 2.3's ObjectStore caches its
  * PersistenceManagerFactory statically, so one embedded Derby serves the
  * whole JVM — callers share [[EmbeddedHmsCatalogClient.client]] and
  * isolate by database name, exactly as they would against one shared
  * metastore service.
  */
class EmbeddedHmsCatalogClient private[catalog] (ms: IMetaStoreClient,
    override val catalogName: String = "hms_embedded")
  extends CatalogSyncClient {

  import EmbeddedHmsCatalogClient.FormatProp

  private def db(id: CatalogTableIdentifier) = id.normalized.database
  private def tbl(id: CatalogTableIdentifier) = id.normalized.table

  override def hasDatabase(name: String): Boolean = synchronized {
    try { ms.getDatabase(CatalogTableIdentifier.normalize(name)); true }
    catch { case _: NoSuchObjectException => false }
  }

  override def createDatabase(name: String): Unit = synchronized {
    val n = CatalogTableIdentifier.normalize(name)
    if (!hasDatabase(n))
      try ms.createDatabase(new Database(n, "graft-sync", null, null))
      catch { case _: AlreadyExistsException => () }
  }

  override def getTable(id: CatalogTableIdentifier)
      : Option[CatalogTableDef] = synchronized {
    try {
      val t = ms.getTable(db(id), tbl(id))
      val sd = t.getSd
      val params = Option(t.getParameters)
        .map(_.asScala.toMap).getOrElse(Map.empty)
      Some(CatalogTableDef(
        id.normalized,
        // the metastore normalizes locations to URIs (file:/...); the SPI
        // contract is canonical paths, same as every files-diff join key
        graft.util.PathUtils.canonical(sd.getLocation),
        params.getOrElse(FormatProp, "GRAFT"),
        sd.getCols.asScala.toSeq.map(f => f.getName -> f.getType),
        Option(t.getPartitionKeys).map(_.asScala.toSeq).getOrElse(Nil)
          .map(f => f.getName -> f.getType),
        sd.getInputFormat,
        sd.getOutputFormat,
        Option(sd.getSerdeInfo).map(_.getSerializationLib).getOrElse(""),
        params - FormatProp))
    } catch { case _: NoSuchObjectException => None }
  }

  /** HMS handlers MUTATE these structures in place (transient_lastDdlTime
    * and friends), so every collection must be a mutable java one — an
    * immutable `.asJava` wrapper makes create_table throw.
    */
  private def jmap(m: Map[String, String]): java.util.Map[String, String] =
    new java.util.HashMap[String, String](m.asJava)

  private def jlist[A](s: Seq[A]): java.util.List[A] =
    new java.util.ArrayList[A](s.asJava)

  private def toHive(t: CatalogTableDef): Table = {
    val sd = new StorageDescriptor()
    sd.setCols(jlist(t.columns.map { case (n, ty) =>
      new FieldSchema(n, ty, null) }))
    sd.setLocation(t.location)
    sd.setInputFormat(t.inputFormat)
    sd.setOutputFormat(t.outputFormat)
    sd.setParameters(jmap(Map.empty))
    val serde = new SerDeInfo()
    serde.setSerializationLib(t.serde)
    serde.setParameters(jmap(Map("serialization.format" -> "1")))
    sd.setSerdeInfo(serde)
    val ht = new Table()
    ht.setDbName(t.identifier.normalized.database)
    ht.setTableName(t.identifier.normalized.table)
    ht.setTableType("EXTERNAL_TABLE")
    ht.setSd(sd)
    ht.setPartitionKeys(jlist(t.partitionColumns.map { case (n, ty) =>
      new FieldSchema(n, ty, null) }))
    ht.setParameters(jmap(t.properties + (FormatProp -> t.tableFormat)))
    ht
  }

  override def createTable(table: CatalogTableDef): Unit = synchronized {
    if (!hasDatabase(table.identifier.database))
      throw new IllegalStateException(
        s"no database ${table.identifier.database}")
    try ms.createTable(toHive(table))
    catch {
      case e: AlreadyExistsException => throw new IllegalStateException(
        s"table ${table.identifier.normalized.fqName} already exists", e)
    }
  }

  /** alter_table with the stored entry's identity (createTime) preserved —
    * the metastore treats createTime as table identity across refreshes.
    */
  override def refreshTable(table: CatalogTableDef): Unit = synchronized {
    val id = table.identifier
    val existing =
      try ms.getTable(db(id), tbl(id))
      catch { case _: NoSuchObjectException =>
        throw new IllegalStateException(
          s"no table ${id.normalized.fqName} to refresh") }
    val next = toHive(table)
    next.setCreateTime(existing.getCreateTime)
    ms.alter_table(db(id), tbl(id), next)
  }

  override def createOrReplaceTable(table: CatalogTableDef): Unit =
    synchronized {
      createDatabase(table.identifier.database)
      dropTable(table.identifier)
      createTable(table)
    }

  override def dropTable(id: CatalogTableIdentifier): Unit = synchronized {
    try ms.dropTable(db(id), tbl(id), /*deleteData=*/ false,
      /*ignoreUnknownTab=*/ true)
    catch { case _: NoSuchObjectException => () }
  }

  override def listPartitions(id: CatalogTableIdentifier)
      : Seq[CatalogPartition] = synchronized {
    try ms.listPartitions(db(id), tbl(id), Short.MaxValue).asScala.toSeq
      .map(p => CatalogPartition(p.getValues.asScala.toSeq,
        graft.util.PathUtils.canonical(p.getSd.getLocation)))
      .sortBy(_.values.mkString("/"))
    catch { case _: NoSuchObjectException => Nil }
  }

  /** add_partitions(ifNotExists=true): per-item AlreadyExists entries are
    * no-ops, same as the HMS batch contract the reference relies on.
    */
  override def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit = synchronized {
    if (parts.isEmpty) return
    val t = ms.getTable(db(id), tbl(id))
    val now = (System.currentTimeMillis() / 1000).toInt
    val hps = parts.map { p =>
      val sd = new StorageDescriptor(t.getSd)
      sd.setLocation(p.location)
      val hp = new Partition()
      hp.setDbName(db(id)); hp.setTableName(tbl(id))
      hp.setValues(jlist(p.values))
      hp.setSd(sd)
      hp.setParameters(jmap(Map.empty))
      hp.setCreateTime(now); hp.setLastAccessTime(0)
      hp
    }
    ms.add_partitions(jlist(hps), /*ifNotExists=*/ true,
      /*needResults=*/ false)
  }

  /** Per-item drops; a missing partition is a no-op (HMS throws
    * NoSuchObjectException per entry, which the batch contract absorbs).
    */
  override def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit = synchronized {
    values.foreach { v =>
      try ms.dropPartition(db(id), tbl(id), jlist(v), /*deleteData=*/ false)
      catch { case _: NoSuchObjectException => () }
    }
  }
}

object EmbeddedHmsCatalogClient {

  /** The parameter carrying graft's logical table format through the
    * metastore (the thrift Table has no format field; Glue uses
    * `classification`, Spark uses `spark.sql.sources.provider`).
    */
  val FormatProp = "graft.format"

  /** The one embedded metastore this JVM gets (static PMF in Hive 2.3's
    * ObjectStore) — Derby files live under java.io.tmpdir and the schema
    * is auto-created on first touch.
    */
  lazy val client: EmbeddedHmsCatalogClient = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_embedded_hms").toString
    System.setProperty("derby.system.home", root)
    System.setProperty("derby.stream.error.file", s"$root/derby.log")
    val conf = new HiveConf()
    conf.set("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$root/metastore_db;create=true")
    conf.set("javax.jdo.option.ConnectionDriverName",
      "org.apache.derby.jdbc.EmbeddedDriver")
    conf.set("hive.metastore.warehouse.dir", s"$root/warehouse")
    conf.set("hive.metastore.uris", "")
    conf.set("hive.metastore.schema.verification", "false")
    conf.set("datanucleus.schema.autoCreateAll", "true")
    conf.set("datanucleus.autoCreateSchema", "true")
    conf.set("datanucleus.fixedDatastore", "false")
    new EmbeddedHmsCatalogClient(new HiveMetaStoreClient(conf))
  }

  /** Config keys naming the remote metastore endpoint: Hive's own
    * `hive.metastore.uris` plus the reference's catalog-properties
    * spelling (`externalCatalog.hms.serverUrl`,
    * xtable-hive-metastore HMSCatalogSyncClient's HiveConf input).
    */
  val UrisKeys: Seq[String] =
    Seq("hive.metastore.uris", "externalCatalog.hms.serverUrl")

  def urisOf(properties: Map[String, String]): Option[String] =
    UrisKeys.flatMap(properties.get).map(_.trim).find(_.nonEmpty)

  /** The SAME client against a REMOTE metastore: with
    * `hive.metastore.uris` set, `HiveMetaStoreClient` opens the thrift
    * wire instead of the embedded ObjectStore, and every call above is
    * unchanged — the reason this class programs against
    * [[IMetaStoreClient]]. Remaining `catalogProperties` (kerberos,
    * timeouts, retry counts) pass through into the HiveConf.
    */
  def remote(uris: String, catalogName: String = "hms",
      properties: Map[String, String] = Map.empty)
      : EmbeddedHmsCatalogClient = {
    require(uris.trim.nonEmpty, "remote metastore needs a non-empty uri")
    val conf = new HiveConf()
    properties.foreach { case (k, v) => conf.set(k, v) }
    conf.set("hive.metastore.uris", uris.trim)
    new EmbeddedHmsCatalogClient(new HiveMetaStoreClient(conf),
      catalogName)
  }
}
