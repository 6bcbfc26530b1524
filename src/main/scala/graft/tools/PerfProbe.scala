package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the slowest bench queries — times sub-stages so
  * optimization targets facts, not guesses. Not part of the gate surface.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-perf-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    graft.queries.RelationalQueries.q1PricingSummary(spark, sfDir).count()

    val emb = graft.queries.Tables.embeddings(spark, sfDir)
    println("PROBE embeddings rows " + emb.count())

    time("ivf_operator_only") {
      graft.operators.Similarity
        .ivfNearPairs(emb, "vec_id", "embedding", dim = 64).count()
    }
    time("ann_invariant_harness(via lsh query minus op)") {
      graft.queries.PipelineQueries.annLshPairs(spark, sfDir).count()
    }
    time("ivf_full_query") {
      graft.queries.PipelineQueries.annIvfPairs(spark, sfDir).count()
    }

    val docs = graft.queries.Tables.documents(spark, sfDir)
    println("PROBE documents rows " + docs.count())
    val pairs = time("ngram_pairs") {
      val p = graft.operators.Dedup
        .ngramJaccardBlocked(docs, "doc_id", "text")
      p.count(); p
    }
    time("clusters_from_pairs") {
      graft.operators.Dedup.duplicateClusters(pairs).count()
    }
    time("dedup_clusters_full") {
      graft.queries.PipelineQueries.dedupClusters(spark, sfDir).count()
    }
    time("streaming_hourly") {
      graft.queries.EventsQueries.streamingHourlyCounts(spark, sfDir).count()
    }
    spark.stop()
  }
}
