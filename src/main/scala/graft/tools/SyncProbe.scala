package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.ParquetDirectorySource
import graft.formats.delta._
import graft.sync.TableFormatSync

object SyncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("sync-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def stage[T](name: String)(f: => T): T = {
      Thread.sleep(300); jobs.set(0)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(300)
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f s, jobs=${jobs.get()}")
      r
    }
    graft.queries.RelationalQueries.q1PricingSummary(spark, sfDir).count()
    for (_ <- 1 to 2) {
      val target = graft.util.TempDirs.create("probe_delta")
      val src = new ParquetDirectorySource(spark, s"$sfDir/lineitem.parquet", "lineitem")
      val snap = stage("currentSnapshot")(src.currentSnapshot())
      stage("syncSnapshot")(TableFormatSync.syncSnapshot(
        Seq(new DeltaConversionTarget(spark, target)), snap, src.sourceFormat))
      val back = stage("sourceSnapshot")(
        new DeltaConversionSource(spark, target, "lineitem").currentSnapshot())
      stage("readback")(DeltaRead.toDataFrame(spark, back)
        .groupBy("l_returnflag").count().count())
      graft.util.TempDirs.sweep()
    }
    spark.stop()
  }
}
