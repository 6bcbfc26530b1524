package graft.formats.hudi

import java.nio.file.{Files, Paths}

/** Table-level commit lock for Hudi writers — the
  * FileSystemBasedLockProvider pattern Hudi itself ships for
  * multi-writer tables: Hudi's timeline is append-only with NO
  * table-level CAS, so concurrent writers that must serialize (an
  * exactly-once sink's stamp-check + commit; row-level log writers that
  * would otherwise append blocks into the SAME log file and interleave)
  * take an atomic-create lock file under `.hoodie/`. A crashed holder's
  * lock is broken after [[HudiLock.StaleLockMillis]].
  */
object HudiLock {

  val StaleLockMillis: Long = 10 * 60 * 1000L
  val AcquireTimeoutMillis: Long = 120000L

  def withLock[T](tablePath: String, name: String)(f: => T): T = {
    val lock = Paths.get(tablePath, ".hoodie", s".graft-lock-$name")
    Files.createDirectories(lock.getParent)
    val deadline = System.currentTimeMillis() + AcquireTimeoutMillis
    var held = false
    while (!held) {
      try { Files.createFile(lock); held = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale = try Files.getLastModifiedTime(lock).toMillis <
            System.currentTimeMillis() - StaleLockMillis
          catch { case _: java.io.IOException => false }
          if (stale) Files.deleteIfExists(lock)
          else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"could not acquire Hudi lock $lock within " +
                s"${AcquireTimeoutMillis / 1000}s — break it manually if " +
                "its holder crashed")
          else Thread.sleep(25)
      }
    }
    try f finally Files.deleteIfExists(lock)
  }
}
