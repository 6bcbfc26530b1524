package graft.formats.delta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths => JPaths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Minimal Delta-protocol transaction log layout (public spec:
  * github.com/delta-io/delta PROTOCOL.md; reference reads the same layout
  * through delta-spark's DeltaLog — DeltaConversionSource.java:63-239).
  *
  * Log lives at `<table>/_delta_log/<%020d>.json`, one JSON action per line.
  * Commits are atomic via write-temp + atomic-rename; a commit whose version
  * file already exists loses the race (optimistic concurrency, as in the
  * reference's OptimisticTransaction usage DeltaConversionTarget.java:294).
  */
object DeltaLog {
  val LogDir = "_delta_log"

  def logPath(tablePath: String): String = s"$tablePath/$LogDir"

  def versionFile(tablePath: String, version: Long): String =
    f"${logPath(tablePath)}/$version%020d.json"

  /** Sorted list of commit versions present in the log. */
  def listVersions(tablePath: String, conf: Configuration): Seq[Long] = {
    val dir = new Path(logPath(tablePath))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.dropRight(5).forall(_.isDigit))
      .map(_.dropRight(5).toLong)
      .sorted
  }

  def latestVersion(tablePath: String, conf: Configuration): Option[Long] =
    listVersions(tablePath, conf).lastOption

  def checkpointFile(tablePath: String, version: Long): String =
    f"${logPath(tablePath)}/$version%020d.checkpoint.parquet"

  def lastCheckpointFile(tablePath: String): String =
    s"${logPath(tablePath)}/_last_checkpoint"

  /** Latest checkpoint at or before `version`, if any. */
  def latestCheckpoint(tablePath: String, version: Long, conf: Configuration)
      : Option[Long] = {
    val dir = new Path(logPath(tablePath))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".checkpoint.parquet"))
      .map(_.stripSuffix(".checkpoint.parquet").toLong)
      .filter(_ <= version)
      .sorted.lastOption
  }

  def writeLastCheckpointHint(tablePath: String, version: Long): Unit =
    Files.write(JPaths.get(lastCheckpointFile(tablePath)),
      s"""{"version":$version}""".getBytes(StandardCharsets.UTF_8))

  /** Atomically write one commit file; returns false if the version already
    * exists (concurrent writer won).
    */
  def writeCommit(tablePath: String, version: Long, lines: Iterator[String])
      : Boolean = {
    val target = JPaths.get(versionFile(tablePath, version))
    Files.createDirectories(target.getParent)
    if (Files.exists(target)) return false
    val tmp = Files.createTempFile(target.getParent, s".$version", ".json.tmp")
    val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    try { lines.foreach { l => w.write(l); w.write('\n') } } finally w.close()
    try {
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }
}
