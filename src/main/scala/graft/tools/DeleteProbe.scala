package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only dissection of one deleteWhere: prints every Spark job the op
  * runs with its wall time and call site, so job-count overheads are
  * attributed to code lines instead of guessed at.
  */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("delete-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class Job(id: Int, site: String, var start: Long = 0L,
        var end: Long = 0L)
    val jobs = ArrayBuffer.empty[Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += Job(j.jobId,
            Option(j.properties.getProperty("callSite.short")).getOrElse("?"),
            j.time)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == j.jobId).foreach(_.end = j.time)
        }
    })
    graft.queries.RelationalQueries.q1PricingSummary(spark, sfDir).count()

    val dataDir = graft.util.TempDirs.create("delprobe_data")
    spark.read.parquet(s"$sfDir/customer.parquet").repartition(4)
      .write.mode("overwrite").parquet(dataDir)
    val table = graft.util.TempDirs.create("delprobe_delta")
    val src0 = new graft.sources.ParquetDirectorySource(spark, dataDir, "customer")
    graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, table)),
      src0.currentSnapshot(), src0.sourceFormat)

    jobs.synchronized(jobs.clear())
    Thread.sleep(300)
    val t0 = System.nanoTime()
    graft.formats.delta.DeltaDeletes.deleteWhere(spark, table,
      col("c_acctbal") < 0)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    jobs.synchronized {
      println(f"PROBE deleteWhere wall $wall%.2f s, jobs=${jobs.size}")
      val origin = jobs.headOption.map(_.start).getOrElse(0L)
      var prevEnd = origin
      jobs.foreach { j =>
        val gap = (j.start - prevEnd) / 1e3
        println(f"PROBE  job ${j.id}%3d start ${(j.start - origin) / 1e3}%6.2f" +
          f" dur ${(j.end - j.start) / 1e3}%6.2f gap-before $gap%6.2f")
        prevEnd = math.max(prevEnd, j.end)
      }
    }
    graft.util.TempDirs.sweep()
    spark.stop()
  }
}
