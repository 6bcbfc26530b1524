package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.ParquetDirectorySource

/** Metadata-plane queries: results computed from the engine's *metadata*
  * extraction (file listings, parquet footer stats) — never by scanning row
  * data — then checked against DuckDB aggregates over the actual rows.
  * This is the reference's own oracle idea (stats written by sync must match
  * the data, ITConversionController.java:950-1027) turned into queries.
  */
object MetadataQueries {

  /** Table-level stats for lineitem derived from parquet footers only —
    * no data scan, and no driver fold either: the per-file stats Dataset is
    * exploded and aggregated with groupless min/max/sum, so the merge runs
    * distributed (a 10^7-file listing never lands on the driver; only the
    * one aggregate row does).
    */
  def statsFooterLineitem(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = new ParquetDirectorySource(s, s"$dir/lineitem.parquet", "lineitem")
    val files = src.currentSnapshot().files
    // canonical stat strings decode per type: longs/micros/doubles cast,
    // strings compare raw (StatCodec encodings are cast-compatible)
    def statMin(field: String, cast: String) =
      min(when(col("st.field") === field, col("st.min").cast(cast)))
    def statMax(field: String, cast: String) =
      max(when(col("st.field") === field, col("st.max").cast(cast)))
    val stats = files.select(explode(col("columnStats")).as("st"))
      .agg(
        statMin("l_orderkey", "long").as("min_orderkey"),
        statMax("l_orderkey", "long").as("max_orderkey"),
        statMin("l_quantity", "double").as("min_qty"),
        statMax("l_quantity", "double").as("max_qty"),
        statMin("l_shipdate", "long").as("min_shipdate_us"),
        statMax("l_shipdate", "long").as("max_shipdate_us"),
        statMin("l_returnflag", "string").as("min_returnflag"),
        statMax("l_returnflag", "string").as("max_returnflag"))
    val records = files.agg(
      sum(col("recordCount")).cast("long").as("record_count"))
    records.crossJoin(stats)
      .select("record_count", "min_orderkey", "max_orderkey",
        "min_qty", "max_qty", "min_shipdate_us", "max_shipdate_us",
        "min_returnflag", "max_returnflag")
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
    // concurrent jobs fine; serial submission left cores idle); the
    // per-table sum is a distributed aggregate — one row reaches the driver
    val rows = Await.result(Future.traverse(names) { n => Future {
      import org.apache.spark.sql.functions.sum
      val src = new ParquetDirectorySource(s, s"$dir/$n.parquet", n)
      val total = src.currentSnapshot().files
        .agg(sum("recordCount")).head().getLong(0)
      (n, total)
    }}, 10.minutes)
    rows.toDF("table_name", "record_count").orderBy("table_name")
  }

  /** Partition file-grouping over a hive-partitioned listing: per-group
    * record rollups must match the data (file counts are layout-specific
    * and excluded from the oracle).
    */
  def fileGroups(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataDir = graft.util.TempDirs.create("graft_groups_data")
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

  /** Metadata tables through the unified reader (`table$files` idiom):
    * files / partitions / history over a table that went through a DV
    * delete — counts, DV cardinality and version count all recomputable
    * by the oracle from the data alone.
    */
  def metaTables(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataDir = graft.util.TempDirs.create("graft_meta_data")
    s.read.parquet(s"$dir/customer.parquet").repartition(4)
      .write.mode("overwrite").parquet(dataDir)
    val table = graft.util.TempDirs.create("graft_meta_delta")
    val src = new ParquetDirectorySource(s, dataDir, "customer")
    val outcomes = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    require(graft.formats.delta.DeltaDeletes.deleteWhere(s, table,
      col("c_acctbal") < 0) > 0)

    def meta(which: String) =
      s.read.format("graft").option("metaTable", which).load(table)
    val files = meta("files")
      .agg(count(lit(1)).as("n_files"),
        sum("record_count").as("n_records"),
        sum("dv_cardinality").as("dv_deleted"))
    val parts = meta("partitions")
      .agg(count(lit(1)).as("n_partitions"),
        sum("n_records").as("part_records"))
    val hist = meta("history")
      .agg(count(lit(1)).as("n_versions"),
        max("operation").as("last_op"))
    files.crossJoin(parts).crossJoin(hist)
  }

  val metaTablesSql: String =
    """SELECT CAST(4 AS BIGINT) AS n_files,
      |  count(*) AS n_records,
      |  CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS dv_deleted,
      |  CAST(1 AS BIGINT) AS n_partitions,
      |  count(*) AS part_records,
      |  CAST(2 AS BIGINT) AS n_versions,
      |  'GRAFT SYNC' AS last_op
      |FROM customer""".stripMargin
}
