package graft.util

/** Wall-clock phase instrumentation for multi-phase bench gates. A gate
  * whose timed body is sync → rewrite → read swings with whichever phase
  * is noisiest; recording the per-phase split (surfaced by Bench as a
  * `phases` JSON key) lets a regression be attributed instead of hiding
  * inside the gate's run-to-run variance. Keeps only the LAST timing per
  * name — the bench reports medians per query, phases are diagnostic.
  */
object PhaseTimer {
  private val timings =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    timings.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Record an externally-measured duration (e.g. a streaming listener's
    * batchDuration) under the same diagnostic namespace. */
  def snapshotPut(name: String, seconds: Double): Unit =
    timings.put(name, seconds)

  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    timings.asScala.toMap
  }
}
