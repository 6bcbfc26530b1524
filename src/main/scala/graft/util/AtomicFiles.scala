package graft.util

import java.nio.file.{FileAlreadyExistsException, Files, Path}

/** Put-if-absent publication for commit files.
  *
  * Version-file commits need true put-if-absent semantics (the Delta
  * protocol's optimistic concurrency, and the reference's
  * OptimisticTransaction): of two racing writers of the same version,
  * exactly one may win. An exists-check followed by rename is NOT that —
  * POSIX rename(2) silently replaces an existing target, so both writers
  * "succeed" and one commit is lost. `Files.createLink` throws
  * FileAlreadyExistsException instead of replacing, which makes the
  * link-into-place itself the atomic reservation.
  */
object AtomicFiles {

  /** Publish `tmp`'s content as `target` iff `target` does not exist.
    * The temp file is always removed. Returns false when a concurrent
    * writer won the race.
    */
  def publish(tmp: Path, target: Path): Boolean =
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: FileAlreadyExistsException => false
      case _: UnsupportedOperationException =>
        // Filesystems without hard links: reserve via a HIDDEN lock file
        // (atomic CREATE_NEW), then rename the content into place. The
        // target only ever appears fully written — reserving under the
        // target's own name would publish a visible zero-length commit
        // file for a window, and readers (e.g. Delta replay, which skips
        // empty lines) would treat the commit as empty: silent file loss.
        val lock = target.resolveSibling("." + target.getFileName + ".lock")
        try {
          Files.createFile(lock)
          try {
            if (Files.exists(target)) false   // earlier writer already won
            else {
              Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              true
            }
          } finally {
            Files.deleteIfExists(lock)
          }
        } catch { case _: FileAlreadyExistsException => false }
    } finally {
      Files.deleteIfExists(tmp)
    }
}
