package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spi.{ConversionSource, ConversionTarget}
import graft.sync.TableFormatSync

/** The reference's core oracle, run as a matrix: every source format ×
  * every target format must read row-identical through Spark, unfiltered
  * AND under a filter (ITConversionController.java:227-318, 950-1027 +
  * checkDatasetEquivalenceWithFilter :269-274).
  */
class EquivalenceMatrixSpec extends SparkSuite {

  private val formats = Seq("DELTA", "ICEBERG", "HUDI", "PAIMON")

  private def target(fmt: String, dir: String): ConversionTarget =
    graft.RunSync.buildTarget(spark, fmt, dir)
  private def source(fmt: String, dir: String): ConversionSource =
    graft.RunSync.buildSource(spark, fmt, dir, "customer")

  private def readBack(fmt: String, dir: String): DataFrame = fmt match {
    case "DELTA" => new graft.formats.delta.DeltaConversionSource(
      spark, dir, "customer").toDataFrame
    case "ICEBERG" => new graft.formats.iceberg.IcebergConversionSource(
      spark, dir, "customer").toDataFrame
    case "HUDI" => new graft.formats.hudi.HudiConversionSource(
      spark, dir, "customer").toDataFrame
    case "PAIMON" => new graft.formats.paimon.PaimonConversionSource(
      spark, dir, "customer").toDataFrame
  }

  private def rowsOf(df: DataFrame): Seq[String] =
    df.orderBy("c_custkey").toJSON.collect().toSeq

  test("every source format x target format reads row-identical (with filters)") {
    val parquetPath = sf("sf0.001/customer.parquet")
    val expectAll = rowsOf(spark.read.parquet(parquetPath))
    val expectFiltered = rowsOf(spark.read.parquet(parquetPath)
      .filter(col("c_acctbal") > 5000))

    // stage 1: parquet -> each format
    val staged: Map[String, String] = formats.map { fmt =>
      val dir = tmpDir(s"mx_${fmt.toLowerCase}")
      val src = new graft.sources.ParquetDirectorySource(
        spark, parquetPath, "customer")
      val r = TableFormatSync.syncSnapshot(Seq(target(fmt, dir)),
        src.currentSnapshot(), src.sourceFormat)
      assert(r.forall(_.status == "SUCCESS"), s"parquet->$fmt: ${r.mkString(";")}")
      fmt -> dir
    }.toMap

    for (fmt <- formats) {
      assert(rowsOf(readBack(fmt, staged(fmt))) == expectAll,
        s"parquet->$fmt full read")
      assert(rowsOf(readBack(fmt, staged(fmt))
        .filter(col("c_acctbal") > 5000)) == expectFiltered,
        s"parquet->$fmt filtered read")
    }

    // stage 2: each staged format -> every other format
    for (sFmt <- formats; tFmt <- formats if sFmt != tFmt) {
      val dir = tmpDir(s"mx_${sFmt.toLowerCase}_${tFmt.toLowerCase}")
      val src = source(sFmt, staged(sFmt))
      val r = TableFormatSync.syncSnapshot(Seq(target(tFmt, dir)),
        src.currentSnapshot(), src.sourceFormat)
      assert(r.forall(_.status == "SUCCESS"), s"$sFmt->$tFmt: ${r.mkString(";")}")
      assert(rowsOf(readBack(tFmt, dir)) == expectAll, s"$sFmt->$tFmt full")
      assert(rowsOf(readBack(tFmt, dir)
        .filter(col("c_acctbal") > 5000)) == expectFiltered,
        s"$sFmt->$tFmt filtered")
    }

    // stage 3: the unified reader agrees with every per-format source —
    // format detection plus the FileIndex scan is the one public read API
    for (fmt <- formats) {
      assert(rowsOf(spark.read.format("graft").load(staged(fmt))) == expectAll,
        s"format(graft) on $fmt")
    }
  }
}
