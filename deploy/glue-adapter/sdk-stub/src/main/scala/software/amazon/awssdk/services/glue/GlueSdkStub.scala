// COMPILE-ONLY SIGNATURE STUB of the public AWS SDK v2 Glue API surface
// that AwsSdkGlueApi.scala uses — the sandbox build has no network
// egress, so the real `software.amazon.awssdk:glue` artifact cannot
// resolve; this facade exists so `sbt glueAdapter/compile` pins the
// adapter against signature drift in graft.catalog.GlueApi (the failure
// mode a source-only file cannot catch). Every member throws at runtime:
// a deployment swaps this stub for the real SDK jar (same package,
// classes and method shapes — mirrored from the public AWS SDK for Java
// v2 API reference) without touching AwsSdkGlueApi.
//
// DO NOT add behavior here. If AwsSdkGlueApi needs a new SDK call, add
// the signature only.
package software.amazon.awssdk.services.glue

import java.util.{List => JList, Map => JMap}

private[glue] object Stub {
  def fail: Nothing = throw new UnsupportedOperationException(
    "compile-only AWS SDK stub — deploy against the real " +
      "software.amazon.awssdk:glue artifact")
}

trait GlueClient {
  import model._
  def getDatabase(r: GetDatabaseRequest): GetDatabaseResponse
  def createDatabase(r: CreateDatabaseRequest): AnyRef
  def getTable(r: GetTableRequest): GetTableResponse
  def createTable(r: CreateTableRequest): AnyRef
  def updateTable(r: UpdateTableRequest): AnyRef
  def deleteTable(r: DeleteTableRequest): AnyRef
  def getTableVersionsPaginator(r: GetTableVersionsRequest)
      : java.lang.Iterable[GetTableVersionsResponse]
  def batchDeleteTableVersion(r: BatchDeleteTableVersionRequest): AnyRef
  def getPartitionsPaginator(r: GetPartitionsRequest)
      : java.lang.Iterable[GetPartitionsResponse]
  def batchCreatePartition(r: BatchCreatePartitionRequest)
      : BatchCreatePartitionResponse
  def batchDeletePartition(r: BatchDeletePartitionRequest)
      : BatchDeletePartitionResponse
}

object GlueClient {
  def create(): GlueClient = Stub.fail
}

package model {

  class EntityNotFoundException extends RuntimeException

  // ---- request/response shapes (builder pattern, like the SDK) ----

  class GetDatabaseRequest
  object GetDatabaseRequest {
    class Builder { def name(v: String): Builder = this
      def build(): GetDatabaseRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  trait GetDatabaseResponse { def database(): Database }
  trait Database { def name(): String }

  class CreateDatabaseRequest
  object CreateDatabaseRequest {
    class Builder { def databaseInput(v: DatabaseInput): Builder = this
      def build(): CreateDatabaseRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  class DatabaseInput
  object DatabaseInput {
    class Builder { def name(v: String): Builder = this
      def description(v: String): Builder = this
      def build(): DatabaseInput = Stub.fail }
    def builder(): Builder = new Builder
  }

  class GetTableRequest
  object GetTableRequest {
    class Builder { def databaseName(v: String): Builder = this
      def name(v: String): Builder = this
      def build(): GetTableRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  trait GetTableResponse { def table(): Table }
  trait Table {
    def name(): String
    def tableType(): String
    def parameters(): JMap[String, String]
    def storageDescriptor(): StorageDescriptor
    def partitionKeys(): JList[Column]
  }

  trait StorageDescriptor {
    def location(): String
    def inputFormat(): String
    def outputFormat(): String
    def serdeInfo(): SerDeInfo
    def columns(): JList[Column]
  }
  object StorageDescriptor {
    class Builder { def location(v: String): Builder = this
      def inputFormat(v: String): Builder = this
      def outputFormat(v: String): Builder = this
      def serdeInfo(v: SerDeInfo): Builder = this
      def columns(v: JList[Column]): Builder = this
      def build(): StorageDescriptor = Stub.fail }
    def builder(): Builder = new Builder
  }

  trait SerDeInfo { def serializationLibrary(): String }
  object SerDeInfo {
    class Builder { def serializationLibrary(v: String): Builder = this
      def build(): SerDeInfo = Stub.fail }
    def builder(): Builder = new Builder
  }

  trait Column { def name(): String; def `type`(): String }
  object Column {
    class Builder { def name(v: String): Builder = this
      def `type`(v: String): Builder = this
      def build(): Column = Stub.fail }
    def builder(): Builder = new Builder
  }

  class TableInput
  object TableInput {
    class Builder { def name(v: String): Builder = this
      def tableType(v: String): Builder = this
      def parameters(v: JMap[String, String]): Builder = this
      def storageDescriptor(v: StorageDescriptor): Builder = this
      def partitionKeys(v: JList[Column]): Builder = this
      def build(): TableInput = Stub.fail }
    def builder(): Builder = new Builder
  }

  class CreateTableRequest
  object CreateTableRequest {
    class Builder { def databaseName(v: String): Builder = this
      def tableInput(v: TableInput): Builder = this
      def build(): CreateTableRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  class UpdateTableRequest
  object UpdateTableRequest {
    class Builder { def databaseName(v: String): Builder = this
      def tableInput(v: TableInput): Builder = this
      def build(): UpdateTableRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  class DeleteTableRequest
  object DeleteTableRequest {
    class Builder { def databaseName(v: String): Builder = this
      def name(v: String): Builder = this
      def build(): DeleteTableRequest = Stub.fail }
    def builder(): Builder = new Builder
  }

  class GetTableVersionsRequest
  object GetTableVersionsRequest {
    class Builder { def databaseName(v: String): Builder = this
      def tableName(v: String): Builder = this
      def build(): GetTableVersionsRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  trait GetTableVersionsResponse {
    def tableVersions(): JList[TableVersion]
  }
  trait TableVersion { def versionId(): String }

  class BatchDeleteTableVersionRequest
  object BatchDeleteTableVersionRequest {
    class Builder { def databaseName(v: String): Builder = this
      def tableName(v: String): Builder = this
      def versionIds(v: JList[String]): Builder = this
      def build(): BatchDeleteTableVersionRequest = Stub.fail }
    def builder(): Builder = new Builder
  }

  class GetPartitionsRequest
  object GetPartitionsRequest {
    class Builder { def databaseName(v: String): Builder = this
      def tableName(v: String): Builder = this
      def build(): GetPartitionsRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  trait GetPartitionsResponse { def partitions(): JList[Partition] }
  trait Partition {
    def values(): JList[String]
    def storageDescriptor(): StorageDescriptor
  }

  class PartitionInput
  object PartitionInput {
    class Builder { def values(v: JList[String]): Builder = this
      def storageDescriptor(v: StorageDescriptor): Builder = this
      def build(): PartitionInput = Stub.fail }
    def builder(): Builder = new Builder
  }

  class BatchCreatePartitionRequest
  object BatchCreatePartitionRequest {
    class Builder { def databaseName(v: String): Builder = this
      def tableName(v: String): Builder = this
      def partitionInputList(v: JList[PartitionInput]): Builder = this
      def build(): BatchCreatePartitionRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  trait BatchCreatePartitionResponse {
    def errors(): JList[PartitionError]
  }
  trait PartitionError { def partitionValues(): JList[String] }

  class PartitionValueList
  object PartitionValueList {
    class Builder { def values(v: JList[String]): Builder = this
      def build(): PartitionValueList = Stub.fail }
    def builder(): Builder = new Builder
  }

  class BatchDeletePartitionRequest
  object BatchDeletePartitionRequest {
    class Builder { def databaseName(v: String): Builder = this
      def tableName(v: String): Builder = this
      def partitionsToDelete(v: JList[PartitionValueList]): Builder = this
      def build(): BatchDeletePartitionRequest = Stub.fail }
    def builder(): Builder = new Builder
  }
  trait BatchDeletePartitionResponse {
    def errors(): JList[PartitionError]
  }
}
