package graft

import org.apache.spark.sql.functions._

import graft.formats.iceberg._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** Plan audit for the v3 lineage-resolved scan: the per-file lineage
  * frame must join BROADCAST (it is O(live files) small rows under the
  * byte gate) and the resolution must stay a projection — a sort-merge
  * join or an exchange on the scan side would be a scale regression at
  * 10^6 files.
  */
class LineagePlanProbe extends SparkSuite {
  test("keyedScanWithLineage broadcasts the lineage frame") {
    val stage = tmpDir("linplan_src")
    spark.read.parquet(s"${sf("sf0.001")}/nation.parquet")
      .repartition(1).write.mode("overwrite").parquet(stage)
    val table = tmpDir("linplan_tbl")
    val src = new ParquetDirectorySource(spark, stage, "nation")
    val out = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, table)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"))
    assert(IcebergDeletes.upgradeToV3(spark, table))
    val m = IcebergMetadata.read(table,
      IcebergMetadata.currentVersion(table).get)
    val df = IcebergRowLineage.keyedScanWithLineage(spark, table, m,
      m.headSequence, "nation")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"lineage join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join in the lineage resolution:\n$plan")
    info("lineage scan plan:\n" + plan.linesIterator.take(12).mkString("\n"))
  }
}
