package graft.catalog

// DEPLOYMENT-ONLY SOURCE — not compiled in this repo's sbt build (the
// AWS SDK is not resolvable offline; see deploy/glue-adapter/README.md).
// Mechanical delegation of graft.catalog.GlueApi to
// software.amazon.awssdk.services.glue, one method per operation, per
// the mapping documented on the GlueApi trait. Reference:
// xtable-aws/src/main/java/org/apache/xtable/glue/GlueCatalogSyncClient.java

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.services.glue.GlueClient
import software.amazon.awssdk.services.glue.model._

/** Production [[GlueApi]] over the AWS SDK v2 Glue client. Pure
  * transport: every sync semantic (replace-all updates, version
  * pruning, per-item batch errors) lives above the wire in
  * [[GlueCatalogSyncClient]] and behaves identically over
  * [[InMemoryGlueApi]], which is what the test suite pins.
  */
class AwsSdkGlueApi(glue: GlueClient) extends GlueApi {

  override def getDatabase(name: String): Option[String] =
    try Some(glue.getDatabase(
      GetDatabaseRequest.builder().name(name).build())
      .database().name())
    catch { case _: EntityNotFoundException => None }

  override def createDatabase(name: String): Unit = {
    glue.createDatabase(CreateDatabaseRequest.builder()
      .databaseInput(DatabaseInput.builder().name(name)
        .description("Created by graft catalog sync").build())
      .build())
    ()
  }

  override def getTable(db: String, table: String): Option[GlueTableInput] =
    try {
      val t = glue.getTable(GetTableRequest.builder()
        .databaseName(db).name(table).build()).table()
      val sd = t.storageDescriptor()
      Some(GlueTableInput(
        t.name(),
        Option(t.tableType()).getOrElse("EXTERNAL_TABLE"),
        Option(t.parameters()).map(_.asScala.toMap).getOrElse(Map.empty),
        sd.location(),
        sd.inputFormat(),
        sd.outputFormat(),
        sd.serdeInfo().serializationLibrary(),
        sd.columns().asScala.map(c => c.name() -> c.`type`()).toSeq,
        Option(t.partitionKeys()).map(_.asScala
          .map(c => c.name() -> c.`type`()).toSeq).getOrElse(Nil)))
    } catch { case _: EntityNotFoundException => None }

  private def toTableInput(in: GlueTableInput): TableInput =
    TableInput.builder()
      .name(in.name)
      .tableType(in.tableType)
      .parameters(in.parameters.asJava)
      .storageDescriptor(StorageDescriptor.builder()
        .location(in.location)
        .inputFormat(in.inputFormat)
        .outputFormat(in.outputFormat)
        .serdeInfo(SerDeInfo.builder()
          .serializationLibrary(in.serde).build())
        .columns(in.columns.map { case (n, t) =>
          Column.builder().name(n).`type`(t).build() }.asJava)
        .build())
      .partitionKeys(in.partitionKeys.map { case (n, t) =>
        Column.builder().name(n).`type`(t).build() }.asJava)
      .build()

  override def createTable(db: String, input: GlueTableInput): Unit = {
    // AlreadyExistsException propagates — same contract as the twin
    glue.createTable(CreateTableRequest.builder()
      .databaseName(db).tableInput(toTableInput(input)).build())
    ()
  }

  override def updateTable(db: String, input: GlueTableInput): Unit = {
    // Glue replaces the WHOLE TableInput and records a new table version
    glue.updateTable(UpdateTableRequest.builder()
      .databaseName(db).tableInput(toTableInput(input)).build())
    ()
  }

  override def deleteTable(db: String, table: String): Unit = {
    glue.deleteTable(DeleteTableRequest.builder()
      .databaseName(db).name(table).build())
    ()
  }

  override def tableVersionIds(db: String, table: String): Seq[String] =
    // paginator drains GetTableVersions pages; Glue returns newest first
    glue.getTableVersionsPaginator(GetTableVersionsRequest.builder()
        .databaseName(db).tableName(table).build())
      .asScala.iterator
      .flatMap(_.tableVersions().asScala)
      .map(_.versionId())
      .toSeq

  override def deleteTableVersions(db: String, table: String,
      versionIds: Seq[String]): Unit = {
    // BatchDeleteTableVersion caps at 100 ids per call
    versionIds.grouped(100).foreach { batch =>
      glue.batchDeleteTableVersion(BatchDeleteTableVersionRequest.builder()
        .databaseName(db).tableName(table)
        .versionIds(batch.asJava).build())
    }
  }

  override def getPartitions(db: String, table: String)
      : Seq[GluePartitionInput] =
    glue.getPartitionsPaginator(GetPartitionsRequest.builder()
        .databaseName(db).tableName(table).build())
      .asScala.iterator
      .flatMap(_.partitions().asScala)
      .map(p => GluePartitionInput(p.values().asScala.toSeq,
        p.storageDescriptor().location()))
      .toSeq

  override def batchCreatePartition(db: String, table: String,
      parts: Seq[GluePartitionInput]): Seq[Seq[String]] =
    // BatchCreatePartition caps at 100 entries; AlreadyExists entries
    // come back as per-item errors, never as a thrown batch failure
    parts.grouped(100).flatMap { batch =>
      glue.batchCreatePartition(BatchCreatePartitionRequest.builder()
          .databaseName(db).tableName(table)
          .partitionInputList(batch.map(p => PartitionInput.builder()
            .values(p.values.asJava)
            .storageDescriptor(StorageDescriptor.builder()
              .location(p.location).build())
            .build()).asJava)
          .build())
        .errors().asScala
        .map(_.partitionValues().asScala.toSeq)
    }.toSeq

  override def batchDeletePartition(db: String, table: String,
      values: Seq[Seq[String]]): Seq[Seq[String]] =
    // BatchDeletePartition caps at 25 entries; missing partitions are
    // per-item errors, not failures
    values.grouped(25).flatMap { batch =>
      glue.batchDeletePartition(BatchDeletePartitionRequest.builder()
          .databaseName(db).tableName(table)
          .partitionsToDelete(batch.map(v => PartitionValueList.builder()
            .values(v.asJava).build()).asJava)
          .build())
        .errors().asScala
        .map(_.partitionValues().asScala.toSeq)
    }.toSeq
}
