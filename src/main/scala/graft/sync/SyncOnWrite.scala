package graft.sync

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.spi.{ConversionSource, ConversionTarget, SyncOutcome}

/** Writer-side sync hook — reference XTableSyncTool.java:55-67, which
  * extends HoodieSyncTool so a conversion runs as part of EVERY Hudi
  * write. The Spark-native analog hooks the engine the writes flow
  * through:
  *
  *  - streaming writers: [[SyncOnWriteListener]] registered on
  *    `spark.streams` re-syncs the conversion targets after every
  *    micro-batch the watched query commits — converted metadata trails
  *    the writer by at most one batch, with no poll loop;
  *  - batch writers: [[SyncOnWrite.afterWrite]] wraps a write action so
  *    the sync is part of the same call, the direct XTableSyncTool shape.
  *
  * Both paths reuse the incremental controller, so each hook invocation
  * costs O(new commits), not a full re-sync.
  */
object SyncOnWrite {

  /** Run `write`, then sync its output into the targets — one call, write
    * and conversion together (reference XTableSyncTool.syncHoodieTable).
    */
  def afterWrite(write: => Unit, source: () => ConversionSource,
      targets: () => Seq[ConversionTarget])
      : Seq[SyncOutcome] = {
    write
    new ConversionController().sync(source(), targets())
  }
}

/** Re-syncs after every progress event of the named streaming query.
  * Factories (not instances) because listener callbacks fire on the
  * listener-bus thread across many batches — each sync gets fresh
  * source/target objects, and outcomes are published for observers.
  */
class SyncOnWriteListener(
    queryName: String,
    source: () => ConversionSource,
    targets: () => Seq[ConversionTarget])
  extends StreamingQueryListener {

  private val controller = new ConversionController
  private val last =
    new AtomicReference[Seq[SyncOutcome]](Nil)
  @volatile private var syncedBatches = 0L

  def lastOutcomes: Seq[SyncOutcome] = last.get()
  def batchesSynced: Long = syncedBatches

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    if (e.progress.name == queryName) {
      last.set(controller.sync(source(), targets()))
      syncedBatches += 1
    }
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
