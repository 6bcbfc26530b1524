package graft.formats.iceberg

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Exactly-once Structured-Streaming sink into a graft-managed Iceberg
  * table — the Iceberg twin of
  * [[graft.formats.delta.DeltaStreamSink]]: every micro-batch commit
  * stamps `graft.txn.<appId> = batchId` into the table properties (the
  * role Delta's `txn` action plays), and a replayed batch (restart
  * between commit and checkpoint advance) is detected by
  * `batchId <= last recorded` and skipped — each batch's rows land
  * EXACTLY once however often the stream retries. The data append rides
  * [[IcebergDeletes.appendCommit]], so it inherits the manifest
  * carry-forward, real column bounds from the distributed footer scan,
  * and the conflict RETRY past concurrent pure data appends.
  */
object IcebergStreamSink {

  private def txnKey(appId: String) = s"graft.txn.$appId"

  /** Last committed batch id for `appId`, from the table properties. */
  def lastTxnVersion(spark: SparkSession, tablePath: String,
      appId: String): Option[Long] =
    IcebergMetadata.currentVersion(tablePath)
      .flatMap(v => IcebergMetadata.read(tablePath, v)
        .properties.get(txnKey(appId)).map(_.toLong))

  /** Append one micro-batch idempotently; false = already committed
    * (replay after a restart), nothing written. The table must exist
    * (create it with a sync or appendDataFiles first) — Iceberg appends
    * need the schema's field ids, which only table creation assigns.
    */
  def appendBatch(spark: SparkSession, tablePath: String, batch: DataFrame,
      appId: String, batchId: Long): Boolean = {
    require(IcebergMetadata.currentVersion(tablePath).isDefined,
      s"no Iceberg table at $tablePath — the streaming sink appends to " +
        "an existing table (sync or create it first)")
    if (lastTxnVersion(spark, tablePath, appId).exists(batchId <= _))
      return false
    val dataDir = s"$tablePath/data/stream-${UUID.randomUUID()}"
    batch.write.parquet(dataDir)
    // txnGuard re-checks the stamp against EVERY metadata read inside the
    // commit (initial + each conflict retry): a concurrent/zombie replay
    // of this same batch landing between our check above and the CAS is
    // detected there and this attempt aborts (returns false) instead of
    // re-landing the rows past the intervening commit — strict
    // exactly-once, mirroring the Delta sink's CAS + restart recheck
    IcebergDeletes.appendCommit(spark, tablePath, rows = null,
      content = 0, equalityIds = Nil, dataDir = Some(dataDir),
      extraProps = Map(txnKey(appId) -> batchId.toString),
      txnGuard = Some(txnKey(appId) -> batchId))
  }

  /** Wire a streaming DataFrame into the sink: `foreachBatch` with the
    * idempotent append; the checkpoint dir gives batch ids their
    * stable-replay meaning.
    */
  def writeStream(df: DataFrame, tablePath: String, checkpointDir: String,
      appId: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch.sparkSession, tablePath, batch, appId, batchId)
        ()
      }
}
