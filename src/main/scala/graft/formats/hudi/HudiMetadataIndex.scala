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
  * contract with a parquet-backed index under `.hoodie/metadata/files/`:
  * each commit appends ONE per-instant delta (O(commit), written by Spark,
  * so the index write is itself distributed), and the reader merges deltas
  * latest-per-path — the same base+log merge shape as the real metadata
  * table, without Hudi's HFile container (not on this classpath).
  */
object HudiMetadataIndex {

  def indexDir(tablePath: String): String =
    s"${HudiTimeline.hoodieDir(tablePath)}/metadata/files"

  def exists(tablePath: String): Boolean =
    Files.exists(JPaths.get(indexDir(tablePath)))

  /** Append one commit's added files (with their stats) as an index delta. */
  def write(spark: SparkSession, tablePath: String, instant: String,
      adds: Dataset[FileEntry]): Unit =
    adds.write.mode("overwrite").parquet(s"${indexDir(tablePath)}/$instant")

  /** The merged index: latest entry per path across all commit deltas.
    * Empty when the table has no index (reader falls back to footers).
    */
  def read(spark: SparkSession, tablePath: String): Dataset[FileEntry] = {
    import spark.implicits._
    val dir = JPaths.get(indexDir(tablePath))
    if (!Files.exists(dir)) return spark.emptyDataset[FileEntry]
    import scala.jdk.CollectionConverters._
    val deltas = Files.list(dir).iterator().asScala
      .filter(p => Files.isDirectory(p)).map(_.toString).toSeq.sorted
    if (deltas.isEmpty) return spark.emptyDataset[FileEntry]
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("path").orderBy(col("lastModifiedMillis").desc)
    spark.read.parquet(deltas: _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .as[FileEntry]
  }
}
