package graft.util

import org.apache.spark.sql.DataFrame

/** Fan a CPU-heavy per-row pass out to the cluster when the input scan
  * alone cannot (guide §2.5 "input skew — repartition immediately after
  * the read"): a sub-split-size input (one row group, one task) would
  * otherwise run the whole tokenize/hash pass single-threaded however
  * many cores the cluster has.
  *
  * Scale-gated: batch inputs repartition only when the optimizer's size
  * estimate says the scan yields fewer splits than
  * `defaultParallelism` (estimate < maxPartitionBytes × parallelism) —
  * a 100 TB corpus never qualifies (its scan already fills the
  * cluster), and the shuffle this moves is bounded by that product.
  * Streaming inputs pass through untouched: the extra exchange per
  * micro-batch (on top of the stateful operator's own state shuffle)
  * measured as a net loss at gate scale, and a stream's static join
  * sides are batch frames that still qualify on their own.
  * Row-level results are unchanged (per-row computation; round-robin
  * repartition is retry-deterministic via sort-before-repartition).
  */
object Fanout {

  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    if (p <= 1 || df.isStreaming) return df
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(maxPart) * p) df.repartition(p) else df
  }
}
