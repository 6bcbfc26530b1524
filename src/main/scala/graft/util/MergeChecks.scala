package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared MERGE-source prolog: source row count + duplicate-key refusal
  * answered by ONE grouped aggregate (one Spark job) instead of a
  * `count()` plus a separate groupBy/filter/limit/count probe per merge
  * (guide §1.2 — fewer passes; the probe data is the same either way).
  */
object MergeChecks {

  /** Returns the source row count; refuses when any key grouping holds
    * more than one source row (same refusal as delta-spark MERGE, same
    * message as the two-job form this replaces).
    */
  def countNoDupKeys(srcProj: DataFrame, keyCols: Seq[String]): Long = {
    val row = srcProj.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")), max(col("__n")))
      .head()
    val n = if (row.isNullAt(0)) 0L else row.getLong(0)
    require(n == 0L || row.getLong(1) <= 1L,
      "mergeInto source has duplicate keys — a target row would match " +
        "more than one source row (same refusal as delta-spark MERGE)")
    n
  }
}
