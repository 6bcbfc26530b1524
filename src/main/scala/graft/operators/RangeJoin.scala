package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — left point within [start, end) of right
  * intervals. Spark plans a raw range condition as a broadcast-nested-loop
  * (O(points × intervals) per key); the scalable form buckets the range
  * axis: points equi-join their bin, intervals explode to the bins they
  * span, and the exact predicate filters the bucket's candidates — the
  * standard bin-then-verify range-join shape (Databricks' range-join hint
  * does the same under the hood). Cost: O(points + interval-bins +
  * candidates), shuffle on (key, bin).
  */
object RangeJoin {

  /** @param binWidth bucket width in the point column's own units (e.g.
    *   micros for epoch-microsecond timestamps); choose ~the median
    *   interval length so intervals span O(1) bins.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String, binWidth: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(ptCol) / binWidth))
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(col(startCol) / binWidth),
      floor((col(endCol) - 1) / binWidth))))
    p.join(iv, keyCols :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }
}
