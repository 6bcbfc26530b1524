package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor (dev tool): prints `explain formatted` evidence that the
  * headline queries produce the plans a 100 TB cluster needs — filters
  * pushed to the parquet scan, pruned read schemas, broadcast joins for
  * dimensions, whole-stage codegen coverage.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq.filterNot(_.startsWith("--"))
      else Seq("q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier", "q6_revenue_forecast", "q13_brand_revenue",
        "events_hourly_counts", "dedup_exact")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).filter(_.nonEmpty).toSeq
      val readSchemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1).split(",").length).toSeq
      val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
      val sortMerge = "SortMergeJoin".r.findAllIn(plan).size
      // NB: codegen asterisks only appear once AQE finalizes; this audit
      // reads the pre-execution plan, so count shuffles instead
      val exchanges = "Exchange ".r.findAllIn(plan).size
      println(s"== $name")
      println(s"   pushedFilters=${pushed.size} readSchemaCols=$readSchemas " +
        s"broadcastJoins=$broadcasts sortMergeJoins=$sortMerge " +
        s"exchanges=$exchanges")
      if (args.contains("--full")) println(plan)
    }
    spark.stop()
  }
}
