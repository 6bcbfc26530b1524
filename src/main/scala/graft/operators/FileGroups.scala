package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.FileEntry

/** Partition file-grouping — reference PartitionFileGroup.fromFiles
  * (PartitionFileGroup.java:38-54): files grouped by identical partition
  * values, here as a shuffle-partitioned aggregation instead of a
  * driver-side groupBy, with the per-group rollups targets want (file
  * count, record count, bytes).
  */
object FileGroups {

  def byPartition(files: Dataset[FileEntry]): DataFrame =
    files.toDF()
      .withColumn("partition_key",
        concat_ws("/", transform(col("partitionValues"),
          p => concat(p.getField("field"), lit("="), p.getField("value")))))
      .groupBy("partition_key")
      .agg(
        count(lit(1)).as("n_files"),
        sum("recordCount").as("n_records"),
        sum("fileSizeBytes").as("total_bytes"),
        collect_list("path").as("paths"))
      .orderBy("partition_key")
}
