package graft.sync

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import graft.spi._

/** Continuous (poll-loop) sync — reference RunSync.java:257-284:
  * scheduleAtFixedRate over the controller, default 5 s interval. Each tick
  * is an incremental sync (falling back to full per controller policy);
  * results of the latest tick are observable via `lastOutcomes`.
  */
class ContinuousSync(
    source: ConversionSource,
    targets: Seq[ConversionTarget],
    intervalMillis: Long = 5000L) {

  private val controller = new ConversionController
  private val executor = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-continuous-sync"); t.setDaemon(true); t
  })
  private val last = new AtomicReference[Seq[SyncOutcome]](Nil)
  @volatile private var ticks = 0L

  def lastOutcomes: Seq[SyncOutcome] = last.get()
  def tickCount: Long = ticks

  def start(): this.type = {
    executor.scheduleAtFixedRate(() => {
      try {
        last.set(controller.sync(source, targets))
        ticks += 1
      } catch { case e: Exception =>
        last.set(Seq(SyncOutcome("?", SyncMode.Incremental, "ERROR", "",
          0L, Some(e.toString))))
        ticks += 1
      }
    }, 0L, intervalMillis, TimeUnit.MILLISECONDS)
    this
  }

  def stop(): Unit = {
    executor.shutdown()
    executor.awaitTermination(30, TimeUnit.SECONDS)
  }

  /** Block until at least `n` ticks have completed (test/CLI helper). */
  def awaitTicks(n: Long, timeoutMillis: Long = 60000L): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    while (ticks < n && System.currentTimeMillis() < deadline) Thread.sleep(20)
    ticks >= n
  }
}
