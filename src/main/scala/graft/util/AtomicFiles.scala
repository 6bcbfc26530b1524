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
        // filesystems without hard links: reserve the name atomically
        // (CREATE_NEW), then replace the empty reservation with the content
        try {
          Files.createFile(target)
          Files.move(tmp, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          true
        } catch { case _: FileAlreadyExistsException => false }
    } finally {
      Files.deleteIfExists(tmp)
    }
}
