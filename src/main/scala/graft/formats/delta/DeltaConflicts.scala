package graft.formats.delta

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.util.{HadoopConfs, Jsons}

/** Optimistic commit-conflict retry — delta-spark's ConflictChecker
  * rule (reference `OptimisticTransaction`/`ConflictChecker`, same
  * policy in Iceberg's `commit.retry-num-retries`): a commit that loses
  * the version CAS may re-land against the new head when every
  * intervening commit
  *
  *  - carries NO `metaData` or `protocol` action (schema, properties or
  *    feature changes invalidate any planned commit), and
  *  - touches a file set DISJOINT from this commit's adds+removes
  *    (overlap means the two operations acted on the same data — a
  *    blind re-land would resurrect removed files or double-apply).
  *
  * True conflicts still fail loudly with the original message shape.
  *
  * Scale shape: the commit's action lines spool to a local temp file
  * ONCE (a retry replays bytes, never the upstream lineage — DV scans,
  * footer reads), and the disjointness probe is a distributed join
  * between the spool and the intervening commit files; the driver holds
  * no path set on either side.
  */
object DeltaConflicts {

  val MaxRetries = 3

  /** Commit `lines` at `plannedVersion`, retrying past non-conflicting
    * intervening commits; returns the version that actually landed.
    */
  def commitWithRetry(spark: SparkSession, tablePath: String,
      plannedVersion: Long, lines: Iterator[String]): Long = {
    val conf = HadoopConfs.session(spark)
    val spool = Files.createTempFile("graft-commit-", ".jsonl")
    try {
      val w = Files.newBufferedWriter(spool, StandardCharsets.UTF_8)
      try lines.foreach { l => w.write(l); w.write('\n') } finally w.close()
      var version = plannedVersion
      var attempt = 0
      while (attempt <= MaxRetries) {
        val src = Files.lines(spool)
        val ok = try DeltaLog.writeCommit(tablePath, version,
          src.iterator().asScala) finally src.close()
        if (ok) return version
        attempt += 1
        val head = DeltaLog.latestVersion(tablePath, conf).getOrElse(version)
        val intervening = DeltaLog.listVersions(tablePath, conf)
          .filter(v => v >= version && v <= head)
        checkReconcilable(spark, tablePath, intervening, spool.toString)
        version = head + 1
      }
      throw new IllegalStateException(
        s"gave up after $MaxRetries conflict retries at $tablePath — " +
          "re-run the operation against the new snapshot")
    } finally Files.deleteIfExists(spool)
  }

  /** add/remove path of one commit line, if it is a data-file action
    * (cdc sidecars and commitInfo/txn lines never conflict).
    */
  private def pathOf(line: String): Option[String] = {
    val n = Jsons.mapper.readTree(line)
    Option(n.get("add")).map(_.get("path").asText)
      .orElse(Option(n.get("remove")).map(_.get("path").asText))
  }

  /** Loud failure unless every intervening commit is reconcilable with
    * the spooled commit (no metadata/protocol change, disjoint files).
    */
  private def checkReconcilable(spark: SparkSession, tablePath: String,
      versions: Seq[Long], spoolPath: String): Unit = {
    import spark.implicits._
    def fail(why: String): Nothing = throw new IllegalStateException(
      s"concurrent writer committed version(s) ${versions.mkString(",")} " +
        s"first at $tablePath and the commits conflict ($why) — re-run " +
        "the operation against the new snapshot")
    if (versions.isEmpty) fail("intervening commits not readable")
    val theirs = spark.read.textFile(
        versions.map(v => DeltaLog.versionFile(tablePath, v)): _*)
      .mapPartitions(_.map { l =>
        val n = Jsons.mapper.readTree(l)
        (n.has("metaData"),
          Option(n.get("protocol")).map(_.toString),
          Option(n.get("add")).map(_.get("path").asText)
            .orElse(Option(n.get("remove")).map(_.get("path").asText)))
      }).persist()
    try {
      if (!theirs.filter(_._1).isEmpty) fail("table metadata changed")
      // an intervening protocol action conflicts UNLESS it is the same
      // idempotent upgrade this commit carries (two deleteWhere writers
      // both raising to the DV feature protocol compute identical lines
      // from identical inputs — delta-spark treats that as compatible)
      val theirProtocols = theirs.flatMap(_._2).distinct().collect()
      if (theirProtocols.nonEmpty) {
        val ours = Files.lines(java.nio.file.Paths.get(spoolPath))
        val ourProtocol =
          try ours.iterator().asScala
            .flatMap(l => Option(Jsons.mapper.readTree(l).get("protocol")))
            .nextOption()
          finally ours.close()
        val same = ourProtocol.exists(o =>
          theirProtocols.forall(t => Jsons.mapper.readTree(t) == o))
        if (!same) fail("protocol changed")
      }
      val theirPaths = theirs.flatMap(_._3).toDF("q")
      val ourPaths = spark.read.textFile(spoolPath)
        .flatMap(pathOf(_)).toDF("p")
      val clash = ourPaths
        .join(theirPaths, col("p") === col("q")).limit(1).count()
      if (clash > 0) fail("overlapping file sets")
    } finally theirs.unpersist()
  }
}
