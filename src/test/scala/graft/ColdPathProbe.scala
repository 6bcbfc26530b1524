package graft

/** Dev probe: COLD timings (clearCache before each) for the round-5
  * additions — warm cross-query cache sharing in Bench can mask cold-path
  * plan bugs (see the simhash constraint-propagation finding).
  * Run: sbt "Test/runMain graft.ColdPathProbe [sfDir]"
  */
object ColdPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSuite.session
    val newest = Seq("q4_order_priority", "events_funnel", "text_chunking",
      "text_dup_grams", "text_gopher_rules", "text_contamination",
      "dedup_semantic", "ann_pq_topk", "pipeline_curation_e2e",
      "pipeline_write_roundtrip", "streaming_dedup_exact",
      "graft_reader_hudi", "graft_reader_iceberg", "dedup_simhash")
    for (name <- newest) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[cold] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
