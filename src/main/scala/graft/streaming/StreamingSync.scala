package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.ParquetDirectorySource
import graft.spi.ConversionTarget
import graft.sync.ConversionController

/** Structured-Streaming-driven conversion: Spark's file stream is the
  * new-data signal, and each micro-batch runs one incremental sync of the
  * metadata plane. Where `ContinuousSync` polls on a fixed interval, this
  * rides the engine's own file discovery (with its checkpointed offset
  * log), and `Trigger.AvailableNow` gives catch-up-then-stop semantics —
  * the streaming-native form of the reference's `--continuousMode` loop
  * (RunSync.java:259).
  */
object StreamingSync {

  /** Start a conversion stream over a parquet directory.
    *
    * @param availableNow true → process what exists, then stop (batch
    *   catch-up); false → keep running on a processing-time trigger.
    */
  def start(spark: SparkSession, sourceDir: String, tableName: String,
      targets: Seq[ConversionTarget], checkpointDir: String,
      availableNow: Boolean = true,
      intervalMillis: Long = 5000L): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val controller = new ConversionController
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(intervalMillis))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the batch CONTENT is only the trigger; the sync itself replays
        // the source's commit backlog so target bookkeeping stays exact
        val outcomes = controller.sync(
          new ParquetDirectorySource(spark, sourceDir, tableName), targets)
        val failed = outcomes.filter(_.status != "SUCCESS")
        if (failed.nonEmpty) throw new IllegalStateException(
          s"sync failed in batch $batchId: ${failed.mkString(";")}")
      }
      .start()
  }
}
