package graft.util

import java.net.URLDecoder
import java.nio.charset.StandardCharsets

/** Path canonicalization — reference paths/PathUtils.java,
  * DeltaActionsConverter.getFullPathToFile. Paths are the join keys of every
  * files-diff (SURVEY §7.3): one relative-vs-absolute or %-encoding mismatch
  * silently turns an unchanged file into an add+remove pair.
  *
  * Canonical form: absolute, no URI scheme for the local filesystem,
  * URL-decoded, no trailing slash.
  */
object PathUtils {

  def canonical(path: String): String = {
    var p = path
    // %-decode ONLY when the input was a URI (had a scheme): a bare
    // filesystem path legitimately named 'a%20b.parquet' must not be
    // rewritten to 'a b.parquet' — canonical paths are the join keys of
    // every files-diff, and a mangled name turns an unchanged file into a
    // permanent spurious add+remove pair each sync. The reference's
    // PathUtils decodes URI-encoded paths only, same rule.
    val wasUri = p.startsWith("file:")
    if (p.startsWith("file://")) p = p.substring("file://".length)
    else if (p.startsWith("file:")) p = p.substring("file:".length)
    if (wasUri && p.contains('%'))
      p = URLDecoder.decode(p, StandardCharsets.UTF_8)
    if (p.length > 1 && p.endsWith("/")) p = p.dropRight(1)
    p
  }

  /** Decode a Delta-log file path to a filesystem path. PROTOCOL.md defines
    * add/remove `path` as a URL-encoded URI (relative or absolute), so
    * %-escapes decode unconditionally here — unlike [[canonical]], which
    * must leave bare filesystem paths untouched. Literal '+' pre-encodes to
    * %2B because URLDecoder form-decodes bare '+' to space.
    */
  def fromDeltaUri(s: String): String = {
    var p = s
    if (p.startsWith("file://")) p = p.substring("file://".length)
    else if (p.startsWith("file:")) p = p.substring("file:".length)
    if (p.contains('%'))
      p = URLDecoder.decode(p.replace("+", "%2B"), StandardCharsets.UTF_8)
    p
  }

  /** Encode a filesystem path for a Delta-log action (percent-encode
    * illegal URI characters, slash-preserving) — what delta-spark expects
    * to decode on read.
    */
  def toDeltaUri(path: String): String =
    try new java.net.URI(null, null, path, null).getRawPath
    catch { case _: java.net.URISyntaxException => path }

  /** Resolve a possibly-relative child against a table base path. */
  def resolve(basePath: String, child: String): String = {
    val c = canonical(child)
    if (c.startsWith("/")) c else s"${canonical(basePath)}/$c"
  }

  /** Relative path of `child` under `basePath` (for formats that store
    * relative paths in their logs, e.g. Delta add actions).
    */
  def relativize(basePath: String, child: String): String = {
    val b = canonical(basePath) + "/"
    val c = canonical(child)
    if (c.startsWith(b)) c.substring(b.length) else c
  }

  /** Partition directory path (between base and file name), "" if flat. */
  def partitionPath(basePath: String, filePath: String): String = {
    val rel = relativize(basePath, filePath)
    val i = rel.lastIndexOf('/')
    if (i < 0) "" else rel.substring(0, i)
  }
}
