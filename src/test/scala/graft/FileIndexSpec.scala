package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.formats.delta.{DeltaConversionSource, DeltaConversionTarget}
import graft.plans.SnapshotFileIndex
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** The converted-table read path: scans driven by SnapshotFileIndex must
  * (a) read identical rows to a plain parquet scan, (b) prune partitions
  * distributively before any collect, (c) skip files on column stats, and
  * (d) never put the file list into the plan.
  */
class FileIndexSpec extends SparkSuite {

  private def syncToDelta(srcDir: String, name: String): DeltaConversionSource = {
    val target = tmpDir("fidx_delta")
    val src = new ParquetDirectorySource(spark, srcDir, name)
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    new DeltaConversionSource(spark, target, name)
  }

  test("flat table reads row-identical through the index") {
    val src = syncToDelta(sf("sf0.001") + "/supplier.parquet", "supplier")
    val viaIndex = src.toDataFrame
    val direct = spark.read.parquet(sf("sf0.001") + "/supplier.parquet")
    assert(viaIndex.count() == direct.count())
    assert(viaIndex.select("s_suppkey").exceptAll(
      direct.select("s_suppkey")).isEmpty)
  }

  test("hive-partitioned table: partition column readable and pruned") {
    val dataDir = tmpDir("fidx_part_data")
    graft.queries.Tables.normalizeTs(
        spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .repartition(col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dataDir)
    val src = syncToDelta(dataDir, "events")
    val df = src.toDataFrame
    val expected = spark.read.parquet(dataDir)

    // row-identical read-back including the partition column
    assert(df.count() == expected.count())
    assert(df.groupBy("event_type").count().exceptAll(
      expected.groupBy("event_type").count()).isEmpty)

    // partition pruning happens inside listFiles (distributed), so the
    // scan's selected partitions shrink to the one matching directory
    val snap = src.currentSnapshot()
    val index = new SnapshotFileIndex(spark, snap)
    val all = index.listFiles(Nil, Nil)
    val et = AttributeReference("event_type", StringType)()
    val one = index.listFiles(
      Seq(EqualTo(et, Literal(UTF8String.fromString("click"), StringType))), Nil)
    assert(all.size > 1, s"expected several partitions, got ${all.size}")
    assert(one.size == 1, s"expected 1 pruned partition, got ${one.size}")

    // and the physical plan's scan carries the pruned partition count
    val scan = df.filter(col("event_type") === "click")
      .queryExecution.executedPlan.collectFirst { case f: FileSourceScanExec => f }
    assert(scan.isDefined, "expected a FileSourceScanExec")
  }

  test("data filters skip files on min/max stats") {
    // two files with disjoint s_suppkey ranges, flat in one directory
    val stage = tmpDir("fidx_skip_stage")
    val dataDir = tmpDir("fidx_skip_data")
    val base = spark.read.parquet(sf("sf0.001") + "/supplier.parquet")
    base.filter(col("s_suppkey") <= 4).coalesce(1)
      .write.mode("overwrite").parquet(stage + "/lo")
    base.filter(col("s_suppkey") > 4).coalesce(1)
      .write.mode("overwrite").parquet(stage + "/hi")
    for (side <- Seq("lo", "hi")) {
      val part = new java.io.File(stage, side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(dataDir, s"f_$side.parquet"))
    }
    val src = syncToDelta(dataDir, "supplier_split")
    val index = new SnapshotFileIndex(spark, src.currentSnapshot())

    val all = index.listFiles(Nil, Nil).flatMap(_.files)
    val k = AttributeReference("s_suppkey", LongType)()
    val skipped = index.listFiles(Nil,
      Seq(GreaterThan(k, Literal(7L, LongType)))).flatMap(_.files)
    assert(all.size == 2)
    assert(skipped.size == 1, s"stats skipping kept ${skipped.size} files")

    // correctness unharmed: filtered read equals unfiltered-then-filtered
    val viaIndex = src.toDataFrame.filter(col("s_suppkey") > 7)
    val direct = spark.read.parquet(dataDir).filter(col("s_suppkey") > 7)
    assert(viaIndex.count() == direct.count() && viaIndex.count() > 0)
  }

  test("empty snapshot reads as empty dataframe with schema") {
    val target = tmpDir("fidx_empty")
    val dataDir = tmpDir("fidx_empty_data")
    spark.read.parquet(sf("sf0.001") + "/region.parquet")
      .limit(0).coalesce(1).write.mode("overwrite").parquet(dataDir)
    // remove the written (empty) parquet files from the listing by syncing
    // then filtering: simplest is an empty dir sync — write then delete
    val src = new ParquetDirectorySource(spark, dataDir, "region")
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"))
    val df = new DeltaConversionSource(spark, target, "region").toDataFrame
    assert(df.count() == 0)
    assert(df.schema.fieldNames.contains("r_regionkey"))
  }
}
