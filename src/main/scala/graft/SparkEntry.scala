package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2.
  * `oracleSql`: DuckDB-equivalent ANSI SQL over the same parquet tables;
  * column names/aliases must match the Spark result exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> RelationalQueries.q1PricingSummary _,
    "q3_shipping_priority" -> RelationalQueries.q3ShippingPriority _,
    "q5_local_supplier" -> RelationalQueries.q5LocalSupplier _,
    "q6_revenue_forecast" -> RelationalQueries.q6RevenueForecast _,
    "q7_window_top_customers" -> RelationalQueries.q7WindowTopCustomers _,
    "q8_running_totals" -> RelationalQueries.q8RunningTotals _,
    "q9_rollup" -> RelationalQueries.q9Rollup _,
    "q10_distinct" -> RelationalQueries.q10Distinct _,
    "q11_semi_anti" -> RelationalQueries.q11SemiAnti _,
    "q12_set_ops" -> RelationalQueries.q12SetOps _,
    "q13_brand_revenue" -> RelationalQueries.q13BrandRevenue _,
    "q14_yearly_volume" -> RelationalQueries.q14YearlyVolume _,
    "q15_argmax_subquery" -> RelationalQueries.q15ArgmaxSubquery _,
    "q16_percentiles" -> RelationalQueries.q16Percentiles _,
    "q17_approx_distinct" -> RelationalQueries.q17ApproxDistinct _,
    "q18_salted_join" -> RelationalQueries.q18SaltedJoin _,
    "q19_string_funcs" -> RelationalQueries.q19StringFuncs _,
    "q20_null_handling" -> RelationalQueries.q20NullHandling _,
    "events_hourly_counts" -> EventsQueries.hourlyCounts _,
    "streaming_hourly_counts" -> EventsQueries.streamingHourlyCounts _,
    "events_sessionize" -> EventsQueries.sessionize _,
    "events_top_per_user" -> EventsQueries.topEventPerUser _,
    "events_asof_join" -> EventsQueries.asofClickView _,
    "events_range_join" -> EventsQueries.rangeJoinFirstHour _,
    "meta_stats_footer" -> MetadataQueries.statsFooterLineitem _,
    "meta_listing_counts" -> MetadataQueries.listingRecordCounts _,
    "meta_file_groups" -> MetadataQueries.fileGroups _,
    "sync_parquet_to_delta" -> SyncQueries.syncParquetToDelta _,
    "sync_incremental_delta" -> SyncQueries.syncIncrementalDelta _,
    "sync_parquet_to_iceberg" -> SyncQueries.syncParquetToIceberg _,
    "sync_parquet_to_hudi" -> SyncQueries.syncParquetToHudi _,
    "sync_parquet_to_paimon" -> SyncQueries.syncParquetToPaimon _,
    "sync_chain_delta_iceberg" -> SyncQueries.syncChainDeltaIceberg _,
    "sync_partitioned_events" -> SyncQueries.syncPartitionedEvents _,
    "sync_time_partitioned" -> SyncQueries.syncTimePartitioned _,
    "time_travel_delta" -> SyncQueries.timeTravelDelta _,
    "graft_reader_delta" -> SyncQueries.graftReaderDelta _,
    "catalog_sql_roundtrip" -> SyncQueries.catalogSqlRoundtrip _,
    "dedup_exact" -> PipelineQueries.dedupExact _,
    "dedup_ngram_jaccard" -> PipelineQueries.dedupNgramJaccard _,
    "dedup_clusters" -> PipelineQueries.dedupClusters _,
    "dedup_embedding_clusters" -> PipelineQueries.dedupEmbeddingClusters _,
    "dedup_minhash_lsh" -> PipelineQueries.dedupMinhashLsh _,
    "dedup_simhash" -> PipelineQueries.dedupSimhash _,
    "ann_bruteforce" -> PipelineQueries.annBruteforce _,
    "ann_lsh_pairs" -> PipelineQueries.annLshPairs _,
    "ann_ivf_pairs" -> PipelineQueries.annIvfPairs _,
    "text_quality" -> PipelineQueries.textQuality _,
    "text_train_split" -> PipelineQueries.trainSplit _,
    "text_langid" -> PipelineQueries.textLangid _,
    "text_fingerprint" -> PipelineQueries.textFingerprint _,
    "multimodal_features" -> PipelineQueries.multimodalFeatures _
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> RelationalQueries.q1Sql,
    "q3_shipping_priority" -> RelationalQueries.q3Sql,
    "q5_local_supplier" -> RelationalQueries.q5Sql,
    "q6_revenue_forecast" -> RelationalQueries.q6Sql,
    "q7_window_top_customers" -> RelationalQueries.q7Sql,
    "q8_running_totals" -> RelationalQueries.q8Sql,
    "q9_rollup" -> RelationalQueries.q9Sql,
    "q10_distinct" -> RelationalQueries.q10Sql,
    "q11_semi_anti" -> RelationalQueries.q11Sql,
    "q12_set_ops" -> RelationalQueries.q12Sql,
    "q13_brand_revenue" -> RelationalQueries.q13Sql,
    "q14_yearly_volume" -> RelationalQueries.q14Sql,
    "q15_argmax_subquery" -> RelationalQueries.q15Sql,
    "q16_percentiles" -> RelationalQueries.q16Sql,
    "q17_approx_distinct" -> RelationalQueries.q17Sql,
    "q18_salted_join" -> RelationalQueries.q18Sql,
    "q19_string_funcs" -> RelationalQueries.q19Sql,
    "q20_null_handling" -> RelationalQueries.q20Sql,
    "events_hourly_counts" -> EventsQueries.hourlyCountsSql,
    "streaming_hourly_counts" -> EventsQueries.hourlyCountsSql,
    "events_sessionize" -> EventsQueries.sessionizeSql,
    "events_top_per_user" -> EventsQueries.topEventPerUserSql,
    "events_asof_join" -> EventsQueries.asofClickViewSql,
    "events_range_join" -> EventsQueries.rangeJoinFirstHourSql,
    "meta_stats_footer" -> MetadataQueries.statsFooterLineitemSql,
    "meta_listing_counts" -> MetadataQueries.listingRecordCountsSql,
    "meta_file_groups" -> MetadataQueries.fileGroupsSql,
    "sync_parquet_to_delta" -> SyncQueries.syncParquetToDeltaSql,
    "sync_incremental_delta" -> SyncQueries.syncIncrementalDeltaSql,
    "sync_parquet_to_iceberg" -> SyncQueries.syncParquetToIcebergSql,
    "sync_parquet_to_hudi" -> SyncQueries.syncParquetToHudiSql,
    "sync_parquet_to_paimon" -> SyncQueries.syncParquetToPaimonSql,
    "sync_chain_delta_iceberg" -> SyncQueries.syncChainDeltaIcebergSql,
    "sync_partitioned_events" -> SyncQueries.syncPartitionedEventsSql,
    "sync_time_partitioned" -> SyncQueries.syncTimePartitionedSql,
    "time_travel_delta" -> SyncQueries.timeTravelDeltaSql,
    "graft_reader_delta" -> SyncQueries.graftReaderDeltaSql,
    "catalog_sql_roundtrip" -> SyncQueries.catalogSqlRoundtripSql,
    "dedup_exact" -> PipelineQueries.dedupExactSql,
    "dedup_ngram_jaccard" -> PipelineQueries.dedupNgramJaccardSql,
    "dedup_clusters" -> PipelineQueries.dedupClustersSql,
    "dedup_embedding_clusters" -> PipelineQueries.dedupEmbeddingClustersSql,
    "dedup_minhash_lsh" -> PipelineQueries.dedupMinhashLshSql,
    "dedup_simhash" -> PipelineQueries.dedupSimhashSql,
    "ann_bruteforce" -> PipelineQueries.annBruteforceSql,
    "ann_lsh_pairs" -> PipelineQueries.annLshPairsSql,
    "ann_ivf_pairs" -> PipelineQueries.annIvfPairsSql,
    "text_quality" -> PipelineQueries.textQualitySql,
    "text_train_split" -> PipelineQueries.trainSplitSql,
    "text_langid" -> PipelineQueries.textLangidSql,
    "text_fingerprint" -> PipelineQueries.textFingerprintSql,
    "multimodal_features" -> PipelineQueries.multimodalFeaturesSql
  )
}
