package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-plane query surface: the queries a user of the converted tables runs
  * through Spark (reference contract: converted tables answer the same
  * queries through any engine — ITConversionController.java:950-1027).
  *
  * Aggregates over `double` columns are computed in DECIMAL so the result is
  * independent of partition/merge order (float addition is not associative;
  * a 32-way local sum vs DuckDB's single-thread sum would differ in ulps).
  * This is also the 100 TB answer: decimal sums are exact at any parallelism.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: scan + filter + groupBy agg. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(25,6)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(25,6)")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(25,6)")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(CAST(l_quantity AS DECIMAL(25,6))) AS sum_qty,
      |  sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS sum_base_price,
      |  sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
