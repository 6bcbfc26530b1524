package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
      Thread.sleep(200); jobs.set(0)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200)
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f s, jobs=${jobs.get()}")
      r
    }
    graft.queries.RelationalQueries.q1PricingSummary(spark, sfDir).count()
    // replicate the delta_changes_feed gate with stage timing
    val dataDir = graft.util.TempDirs.create("probe_cdf_data")
    spark.read.parquet(s"$sfDir/customer.parquet").repartition(4)
      .write.mode("overwrite").parquet(dataDir)
    val table = graft.util.TempDirs.create("probe_cdf_delta")
    val src0 = new graft.sources.ParquetDirectorySource(spark, dataDir, "customer")
    stage("sync")(graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, table)),
      src0.currentSnapshot(), src0.sourceFormat))
    val v0 = stage("enableCdf")(
      graft.formats.delta.DeltaChanges.enableChangeDataFeed(spark, table))
    stage("deleteWhere")(graft.formats.delta.DeltaDeletes.deleteWhere(
      spark, table, col("c_acctbal") < 0))
    val live = stage("liveRead")(new graft.formats.delta
      .DeltaConversionSource(spark, table, "customer").toDataFrame)
    val updates = live.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
    val fresh = live.filter(col("c_custkey") % 10 === 1)
      .withColumn("c_custkey", col("c_custkey") + 10000000L)
    stage("mergeInto")(graft.formats.delta.DeltaDeletes.mergeInto(
      spark, table, updates.unionByName(fresh), Seq("c_custkey")))
    val head = graft.formats.delta.DeltaLog.latestVersion(table,
      graft.util.HadoopConfs.session(spark)).get
    val feed = stage("changesBetween-plan")(
      graft.formats.delta.DeltaChanges.changesBetween(spark, table, v0, head))
    stage("changesBetween-exec")(feed.groupBy("_change_type")
      .agg(count(lit(1))).collect())
    graft.util.TempDirs.sweep()
    spark.stop()
  }
}
