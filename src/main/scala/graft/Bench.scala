package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is forced with a count() and timed THREE times after an
  * untimed warmup pass of the flagship query; `queries` reports the
  * per-query MEDIAN and `value` the sum of medians. Round 4's single-run
  * harness produced 5–7× phantom swings on sub-second queries (JIT and
  * run-order cache state dominate); the median of three collapses that
  * noise, and the full per-run matrix is kept in `runs` so a genuinely
  * bimodal query is visible rather than averaged away.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: JIT, codegen cache, file listing caches (untimed)
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }

    // CALIBRATION CANARY (r13 verdict ask): host speed measured, not
    // argued. Two fixed probes, each median-of-3 after an untimed warm
    // pass — (a) a pure-JVM single-thread xorshift loop (CPU clock +
    // JIT tier), (b) a tiny fixed 32-slice Spark aggregate (scheduler +
    // codegen + thread-pool state). Cross-round comparisons divide the
    // suite totals by these instead of arguing family-uniform ratios.
    def jvmProbe(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var acc = 0L
      var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x
        i += 1
      }
      if (acc == 42L) print("") // keep the loop observable (no DCE)
      (System.nanoTime() - t0) / 1e9
    }
    def sparkProbe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .selectExpr("sum(id % 9973)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def med3(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    jvmProbe(); sparkProbe()
    val calJvm = med3(Seq.fill(3)(jvmProbe()))
    val calSpark = med3(Seq.fill(3)(sparkProbe()))
    val calibration =
      f"""{"jvm_xorshift_200m":$calJvm%.3f,"spark_agg_50m":$calSpark%.3f}"""

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }

    // run-order noise also comes from adjacency (a heavy query evicting the
    // page cache for the next): interleave by running the whole suite
    // nRuns times rather than the same query back-to-back, so each run of a
    // query sees the same neighborhood the single-run harness saw.
    // Between runs (untimed) we sweep the scratch dirs the sync/pipeline
    // queries staged and nudge a GC: without the sweep, run N sees N
    // generations of dead parquet/log files in the temp dir, and the dirty
    // page-cache writeback showed up as 3-6x spikes on later-run queries
    // (r7 bench: text_dup_grams 3.1s in run 3 vs 0.49s; gone with sweep).
    // dev-only subset filter (driver leaves it unset → full suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val runs: Seq[Seq[Double]] =
      (1 to nRuns).map { _ =>
        val times = ordered.map { case (_, fn) => timeOnce(fn) }
        graft.util.TempDirs.sweep()
        System.gc()
        times
      }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }

    val perQuery = ordered.map(_._1).zipWithIndex.map { case (name, i) =>
      val times = runs.map(_(i))
      (name, median(times), times)
    }
    val qs = perQuery.map { case (k, m, _) => "\"" + k + "\":" + f"$m%.3f" }
      .mkString("{", ",", "}")
    val spread = perQuery.map { case (k, _, ts) =>
      "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = perQuery.map(_._2).sum
    // per-phase diagnostics (last run) for multi-phase gates — lets a
    // drift in e.g. delta_zorder_read be attributed to sync/rewrite/read
    val phases = graft.util.PhaseTimer.snapshot().toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // The driver captures only the LAST 2000 BYTES of stdout and parses one
    // JSON line out of that window; every round's full-suite line (4-25 KB)
    // overflowed it and came back `parsed: null` (BENCH_r01..r11 all null).
    // Contract fix: the stdout line carries `value` = total over ALL queries
    // run plus a HEADLINE `queries` map small enough to always fit (~1 KB);
    // the complete per-query medians, per-run matrix and phase timers go to
    // the sidecar detail file, which is what BASELINE.md comparisons read.
    val headline = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q9_rollup",
      "q18_salted_join", "dedup_minhash_lsh", "dedup_simhash",
      "ann_ivf_topk", "text_quality", "pipeline_curation_e2e",
      "sync_parquet_to_delta", "sync_incremental_iceberg",
      "delta_optimize_compact", "iceberg_zorder_read", "sql_merge_routed",
      "streaming_hourly_counts", "streaming_dedup_minhash",
      "time_travel_delta", "mv_incremental_agg",
      "iceberg_v3_dv_read", "catalog_rest_roundtrip")
    val headlineQs = perQuery
      .filter { case (k, _, _) => headline.contains(k) }
      .map { case (k, m, _) => "\"" + k + "\":" + f"$m%.3f" }
      .mkString("{", ",", "}")
    val stdoutLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$headlineQs,"sf":"$sfDir","queries_run":${perQuery.size},"runs_per_query":$nRuns,"calibration":$calibration}"""
    val detail =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$nRuns,"calibration":$calibration,"runs":$spread,"phases":$phases}"""
    val detailPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_DETAIL", "/root/repo/BENCH_detail_local.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(detailPath),
        detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    println(stdoutLine)
    spark.stop()
  }
}
