package graft.formats.hudi

import java.nio.file.{Files, Paths => JPaths}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.FileEntry

/** Hudi metadata-table-shaped file/col-stats index.
  *
  * Reference: HudiFileStatsExtractor.java:136-188 and
  * HudiDataFileExtractor.java:115-126 read column stats and file listings
  * from Hudi's METADATA TABLE when the table has one, and fall back to
  * parquet footers otherwise — on a 100k-file table the index turns 100k
  * footer opens per sync into one metadata read. This mirrors that
  * contract with a parquet-backed index under `.hoodie/.graft/index/`:
  * each commit appends ONE per-instant delta (O(commit), written by Spark,
  * so the index write is itself distributed), and the reader merges deltas
  * latest-per-path — the same base+log merge shape as the real metadata
  * table, without Hudi's HFile container (not on this classpath).
  */
object HudiMetadataIndex {

  /** Commits at or below this many files write their index delta as a
    * driver-side JSON sidecar (`<instant>.json`) instead of a Spark
    * parquet job — the entries are already in driver memory from building
    * the commit JSON, so the sidecar costs one small file write where the
    * parquet delta costs a whole job launch. Readers merge both forms, so
    * the index stays complete either way; large commits keep the
    * distributed parquet write.
    */
  val SmallDeltaThreshold = 64

  /** Writes live under a graft-owned dot-dir inside `.hoodie` (like
    * Hudi's own `.aux`/`.temp`) — NOT `.hoodie/metadata`, which is real
    * Hudi's metadata-table namespace: parquet deltas there could be
    * mistaken for HFile partitions by a real reader.
    */
  def indexDir(tablePath: String): String =
    s"${HudiTimeline.hoodieDir(tablePath)}/.graft/index"

  /** Pre-r7 location, still read for tables written by earlier versions
    * (for a REAL Hudi metadata table at this path the reader naturally
    * sees no parquet dirs / json sidecars and falls back to footers).
    */
  private[hudi] def legacyIndexDir(tablePath: String): String =
    s"${HudiTimeline.hoodieDir(tablePath)}/metadata/files"

  /** The directory this table's index actually lives in. */
  private def resolvedDir(tablePath: String): java.nio.file.Path = {
    val nw = JPaths.get(indexDir(tablePath))
    if (Files.exists(nw)) nw else JPaths.get(legacyIndexDir(tablePath))
  }

  def exists(tablePath: String): Boolean =
    Files.exists(JPaths.get(indexDir(tablePath))) ||
      Files.exists(JPaths.get(legacyIndexDir(tablePath)))

  /** Append one commit's added files (with their stats) as an index delta. */
  def write(spark: SparkSession, tablePath: String, instant: String,
      adds: Dataset[FileEntry]): Unit =
    adds.write.mode("overwrite").parquet(s"${indexDir(tablePath)}/$instant")

  /** The small-commit path: the same delta as `write`, but a single JSON
    * sidecar written by the driver — no Spark job.
    */
  def writeSmall(tablePath: String, instant: String,
      entries: Seq[FileEntry]): Unit = {
    if (entries.isEmpty) return
    val dir = JPaths.get(indexDir(tablePath))
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"$instant.json"),
      graft.util.Jsons.toJson(entries))
  }

  /** The merged index: latest entry per path across all commit deltas
    * (parquet directories AND json sidecars). Empty when the table has no
    * index (reader falls back to footers).
    */
  /** Driver-held index when it is json-only (no parquet delta dirs):
    * latest entry per path, the same winner rule as [[read]]'s window
    * (descending lastModifiedMillis; first-in-file-order on ties). None
    * when parquet deltas exist — those keep the distributed read.
    */
  def readLocal(tablePath: String): Option[Map[String, FileEntry]] = {
    val dir = resolvedDir(tablePath)
    if (!Files.exists(dir)) return Some(Map.empty)
    import scala.jdk.CollectionConverters._
    val children = Files.list(dir).iterator().asScala.toSeq
    if (children.exists(Files.isDirectory(_))) return None
    val best = scala.collection.mutable.Map.empty[String, FileEntry]
    children.filter(p => p.getFileName.toString.endsWith(".json"))
      .sortBy(_.getFileName.toString)
      .foreach { p =>
        jsonFileEntries(p).foreach { fe =>
          if (!best.get(fe.path).exists(
              _.lastModifiedMillis >= fe.lastModifiedMillis))
            best.put(fe.path, fe)
        }
      }
    Some(best.toMap)
  }

  private def jsonFileEntries(p: java.nio.file.Path): Seq[FileEntry] = {
    import scala.jdk.CollectionConverters._
    val arr = graft.util.Jsons.mapper.readTree(Files.readString(p))
    arr.elements().asScala.map { n =>
      FileEntry(n.get("path").asText, n.get("fileSizeBytes").asLong,
        n.get("recordCount").asLong, n.get("fileFormat").asText,
        n.get("partitionValues").elements().asScala.map(m =>
          graft.model.PartitionMember(m.get("field").asText,
            m.get("value").asText)).toSeq,
        n.get("columnStats").elements().asScala.map(s =>
          graft.model.FileColumnStat(s.get("field").asText,
            Option(s.get("min")).filterNot(_.isNull).map(_.asText),
            Option(s.get("max")).filterNot(_.isNull).map(_.asText),
            s.get("numNulls").asLong, s.get("numValues").asLong,
            s.get("totalSize").asLong)).toSeq,
        n.get("lastModifiedMillis").asLong)
    }.toSeq
  }

  def read(spark: SparkSession, tablePath: String): Dataset[FileEntry] = {
    import spark.implicits._
    val dir = resolvedDir(tablePath)
    if (!Files.exists(dir)) return spark.emptyDataset[FileEntry]
    import scala.jdk.CollectionConverters._
    val children = Files.list(dir).iterator().asScala.toSeq
    val parquetDeltas = children.filter(Files.isDirectory(_))
      .map(_.toString).sorted
    val jsonEntries: Seq[FileEntry] = children
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .sortBy(_.getFileName.toString)
      .flatMap(jsonFileEntries)
    if (parquetDeltas.isEmpty && jsonEntries.isEmpty)
      return spark.emptyDataset[FileEntry]
    val parts = Seq.newBuilder[Dataset[FileEntry]]
    if (parquetDeltas.nonEmpty)
      parts += FileEntry.aligned(spark.read.parquet(parquetDeltas: _*))
    if (jsonEntries.nonEmpty) parts += spark.createDataset(jsonEntries)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("path").orderBy(col("lastModifiedMillis").desc)
    parts.result().reduce(_ union _)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .as[FileEntry]
  }
}
