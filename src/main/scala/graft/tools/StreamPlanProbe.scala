package graft.tools
import org.apache.spark.sql.SparkSession
object StreamPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("stream-plan-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("spp_stage")
    val out = graft.util.TempDirs.create("spp_out")
    val ckpt = graft.util.TempDirs.create("spp_ckpt")
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 2 === 0)
    Seq(0, 2).foreach { half =>
      raw.filter(col("doc_id") % 4 === half).coalesce(1)
        .write.parquet(s"$stage/half-$half")
      val part = new java.io.File(s"$stage/half-$half").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(stage, s"batch-$half.parquet"))
    }
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = graft.streaming.StreamingOps.withStatePartitions(spark, 8) {
      graft.streaming.StreamingOps
        .streamingMinhashPairs(stream, raw, "doc_id", "text")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    q.explain(extended = false)
    spark.stop()
  }
}
