package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.formats.delta._
import graft.sources.ParquetDirectorySource
import graft.sync.{ConversionController, TableFormatSync}

/** End-to-end sync conversions surfaced as driver-gate queries: convert the
  * metadata plane, read the converted table back through the engine, and
  * aggregate — the reference's own correctness contract (source and target
  * must read row-identical, ITConversionController.java:950-1027) with
  * DuckDB as the independent oracle.
  */
object SyncQueries {

  /** Parquet dir → Delta (full snapshot), read back via the Delta source. */
  def syncParquetToDelta(s: SparkSession, dir: String): DataFrame = {
    val target = Files.createTempDirectory("graft_delta_li").toString
    val src = new ParquetDirectorySource(s, s"$dir/lineitem.parquet", "lineitem")
    val tgt = new DeltaConversionTarget(s, target)
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(tgt), src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new DeltaConversionSource(s, target, "lineitem").toDataFrame
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(25,6)")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  val syncParquetToDeltaSql: String =
    """SELECT l_returnflag, count(*) AS cnt,
      |  sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS sum_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Incremental file-level CDC: full sync one file, add a second, replay
    * only the new commit, read the union back (values are exactly 2× the
    * source table).
    */
  def syncIncrementalDelta(s: SparkSession, dir: String): DataFrame = {
    val dataDir = Files.createTempDirectory("graft_inc_data").toString
    val target = Files.createTempDirectory("graft_inc_delta").toString
    val srcFile = Paths.get(s"$dir/supplier.parquet")
    Files.copy(srcFile, Paths.get(dataDir, "f1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f1.parquet").toFile.setLastModified(1000000L)
    val controller = new ConversionController
    def src = new ParquetDirectorySource(s, dataDir, "supplier")
    val r1 = controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    require(r1.forall(_.status == "SUCCESS"), r1.mkString(";"))
    Files.copy(srcFile, Paths.get(dataDir, "f2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f2.parquet").toFile.setLastModified(2000000L)
    val r2 = controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    require(r2.forall(o => o.status == "SUCCESS" && o.mode == "INCREMENTAL"),
      r2.mkString(";"))
    new DeltaConversionSource(s, target, "supplier").toDataFrame
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("s_acctbal").cast("decimal(25,6)")).as("sum_bal"),
        countDistinct(col("s_suppkey")).as("distinct_keys"))
  }

  val syncIncrementalDeltaSql: String =
    """SELECT 2*count(*) AS cnt,
      |  2*sum(CAST(s_acctbal AS DECIMAL(25,6))) AS sum_bal,
      |  count(DISTINCT s_suppkey) AS distinct_keys
      |FROM supplier""".stripMargin
}
