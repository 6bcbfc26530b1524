package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.model._
import graft.sources.ParquetDirectorySource

/** Metadata-plane queries: results computed from the engine's *metadata*
  * extraction (file listings, parquet footer stats) — never by scanning row
  * data — then checked against DuckDB aggregates over the actual rows.
  * This is the reference's own oracle idea (stats written by sync must match
  * the data, ITConversionController.java:950-1027) turned into queries.
  */
object MetadataQueries {

  /** Merge per-file canonical stats into table-level (min, max, nulls). */
  private def mergedStat(files: Seq[FileEntry], field: String, dt: DataType)
      : (Option[String], Option[String], Long) = {
    val per = files.flatMap(_.columnStats.filter(_.field == field))
    val mn = per.flatMap(_.min)
      .reduceOption((a, b) => if (StatCodec.lt(a, b, dt)) a else b)
    val mx = per.flatMap(_.max)
      .reduceOption((a, b) => if (StatCodec.lt(a, b, dt)) b else a)
    (mn, mx, per.map(_.numNulls).sum)
  }

  /** Table-level stats for lineitem derived from parquet footers only —
    * no data scan. Exercises: distributed footer read, row-group merge,
    * canonical codec, typed decode.
    */
  def statsFooterLineitem(s: SparkSession, dir: String): DataFrame = {
    val src = new ParquetDirectorySource(s, s"$dir/lineitem.parquet", "lineitem")
    val files = src.currentSnapshot().files.collect().toSeq
    val (minKey, maxKey, _) = mergedStat(files, "l_orderkey", LongType)
    val (minQty, maxQty, _) = mergedStat(files, "l_quantity", DoubleType)
    val (minShip, maxShip, _) = mergedStat(files, "l_shipdate", TimestampType)
    val (minFlag, maxFlag, _) = mergedStat(files, "l_returnflag", StringType)
    val records = files.map(_.recordCount).sum
    val schema = StructType(Seq(
      StructField("record_count", LongType),
      StructField("min_orderkey", LongType), StructField("max_orderkey", LongType),
      StructField("min_qty", DoubleType), StructField("max_qty", DoubleType),
      StructField("min_shipdate_us", LongType), StructField("max_shipdate_us", LongType),
      StructField("min_returnflag", StringType), StructField("max_returnflag", StringType)))
    val row = Row(records,
      minKey.get.toLong, maxKey.get.toLong,
      minQty.get.toDouble, maxQty.get.toDouble,
      minShip.get.toLong, maxShip.get.toLong,
      minFlag.get, maxFlag.get)
    s.createDataFrame(java.util.List.of(row), schema)
  }

  val statsFooterLineitemSql: String =
    """SELECT count(*) AS record_count,
      |  min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  epoch_us(min(l_shipdate)) AS min_shipdate_us,
      |  epoch_us(max(l_shipdate)) AS max_shipdate_us,
      |  min(l_returnflag) AS min_returnflag, max(l_returnflag) AS max_returnflag
      |FROM lineitem""".stripMargin

  /** Snapshot listing correctness: per-file record counts from footers must
    * add up to the table's row count (and null accounting must agree).
    */
  def listingRecordCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val names = Seq("lineitem", "orders", "customer", "part", "supplier",
      "nation", "region", "events", "documents", "embeddings")
    // per-table listing jobs submitted concurrently (Spark schedules
    // concurrent jobs fine; serial submission left cores idle)
    val rows = Await.result(Future.traverse(names) { n => Future {
      val src = new ParquetDirectorySource(s, s"$dir/$n.parquet", n)
      val files = src.currentSnapshot().files.collect()
      (n, files.map(_.recordCount).sum)
    }}, 10.minutes)
    rows.toDF("table_name", "record_count").orderBy("table_name")
  }

  /** Partition file-grouping over a hive-partitioned listing: per-group
    * record rollups must match the data (file counts are layout-specific
    * and excluded from the oracle).
    */
  def fileGroups(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataDir = java.nio.file.Files
      .createTempDirectory("graft_groups_data").toString
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .repartition(col("event_type"))     // one file per partition, not one per task
      .write.mode("overwrite").partitionBy("event_type").parquet(dataDir)
    val files = new ParquetDirectorySource(s, dataDir, "events")
      .currentSnapshot().files
    graft.operators.FileGroups.byPartition(files)
      .select("partition_key", "n_records")
      .orderBy("partition_key")
  }

  val fileGroupsSql: String =
    """SELECT 'event_type=' || event_type AS partition_key,
      |  count(*) AS n_records
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  val listingRecordCountsSql: String =
    Seq("lineitem", "orders", "customer", "part", "supplier",
      "nation", "region", "events", "documents", "embeddings")
      .map(n => s"SELECT '$n' AS table_name, count(*) AS record_count FROM $n")
      .mkString("", " UNION ALL ", " ORDER BY table_name")
}
