package graft.util

import scala.reflect.ClassTag

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Driver-known sequences as distributed Datasets. */
object Par {

  /** `xs` as an n-slice Dataset WITHOUT the round-robin shuffle that
    * `createDataset(xs).repartition(n)` pays: `parallelize` slices the
    * sequence at construction, so the downstream mapPartitions runs as a
    * single shuffle-free stage. Every metadata-plane fan-out (manifest
    * reads, footer scans, file deletes) goes through here.
    */
  def ds[T: Encoder: ClassTag](spark: SparkSession, xs: Seq[T],
      maxSlices: Int): Dataset[T] =
    spark.createDataset(spark.sparkContext.parallelize(xs,
      math.max(1, math.min(xs.size, maxSlices))))
}
