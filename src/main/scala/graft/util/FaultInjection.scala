package graft.util

import java.util.concurrent.atomic.AtomicLong

/** Crash-injection hook for the destructive maintenance paths (Delta
  * VACUUM, Iceberg/Paimon orphan sweeps, Hudi clean). Production cost is
  * one static volatile read per physical delete; armed (tests only), the
  * N+1-th delete throws, simulating a process kill mid-sweep so the
  * crash-consistency contract can be asserted:
  *
  *   1. metadata tombstones precede physical deletes — every sweep first
  *      commits/derives the retained metadata plane, then deletes, so a
  *      kill at ANY delete leaves the table serveable;
  *   2. no live file is ever in the doomed set, so a partial sweep never
  *      loses data;
  *   3. a re-run converges: already-deleted paths no-op (delete returns
  *      false) and the remainder is swept.
  *
  * Single-JVM by design — the same place the local[n] test harness runs
  * its executors. On a real cluster the hook is simply never armed.
  */
object FaultInjection {
  @volatile private var failAfter: Long = Long.MaxValue
  private val deletes = new AtomicLong(0L)

  /** Arm: the first `after` deletes proceed, the next one throws. */
  def armDeleteCrash(after: Long): Unit = {
    deletes.set(0L)
    failAfter = after
  }

  def disarm(): Unit = {
    failAfter = Long.MaxValue
    deletes.set(0L)
  }

  /** Count of physical deletes observed since the last arm/disarm. */
  def observedDeletes: Long = deletes.get()

  /** Call immediately before a maintenance physical delete. */
  def beforeDelete(path: String): Unit =
    if (failAfter != Long.MaxValue && deletes.incrementAndGet() > failAfter)
      throw new java.io.IOException(
        s"injected crash before deleting $path " +
          s"(${deletes.get() - 1} deletes completed)")
}
