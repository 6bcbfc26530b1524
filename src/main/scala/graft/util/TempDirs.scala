package graft.util

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Registry for the scratch directories the gate queries create.
  *
  * Every `SparkEntry.queries` invocation that stages a table writes into a
  * fresh temp directory; a bench pass that runs the whole suite N times
  * would otherwise leave N generations of parquet/log files in the system
  * temp dir — dirty page cache, writeback pressure, and (on long drives)
  * a filling disk, all of which showed up as multi-second spikes on
  * otherwise sub-second queries in later bench runs. Queries register
  * their dirs here; `Bench` sweeps the registry (untimed) between suite
  * runs, and `Verify` sweeps on exit.
  *
  * Only directories created by THIS process are ever deleted — a sweep
  * can never race another JVM's verify/bench run.
  */
object TempDirs {
  private val created = new ConcurrentLinkedQueue[Path]()

  /** Create a temp directory and register it for the next sweep. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Delete every directory registered since the last sweep. Safe to call
    * while Spark is idle only — callers must ensure no live DataFrame still
    * reads from a registered dir (gate queries fully materialize within
    * their invocation, so between-runs is safe).
    */
  def sweep(): Unit = {
    var p = created.poll()
    while (p != null) {
      deleteRecursively(p.toFile)
      p = created.poll()
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }
}
