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
    "meta_stats_footer" -> MetadataQueries.statsFooterLineitem _,
    "meta_listing_counts" -> MetadataQueries.listingRecordCounts _,
    "sync_parquet_to_delta" -> SyncQueries.syncParquetToDelta _,
    "sync_incremental_delta" -> SyncQueries.syncIncrementalDelta _
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> RelationalQueries.q1Sql,
    "meta_stats_footer" -> MetadataQueries.statsFooterLineitemSql,
    "meta_listing_counts" -> MetadataQueries.listingRecordCountsSql,
    "sync_parquet_to_delta" -> SyncQueries.syncParquetToDeltaSql,
    "sync_incremental_delta" -> SyncQueries.syncIncrementalDeltaSql
  )
}
