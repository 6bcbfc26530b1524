package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-plane query surface: the queries a user of the converted tables runs
  * through Spark (reference contract: converted tables answer the same
  * queries through any engine — ITConversionController.java:950-1027).
  *
  * Aggregates over `double` columns are computed as exact integer micros so
  * the result is independent of partition/merge order (float addition is not
  * associative; a 32-way local sum vs DuckDB's single-thread sum would
  * differ in ulps) AND survives the driver's pandas decimal/float asymmetry
  * — see [[Gate]]. Exact integer partial sums are also the 100 TB answer.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: scan + filter + groupBy agg. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Gate.sumMeasure(col("l_quantity")).as("sum_qty"),
        Gate.sumMeasure(col("l_extendedprice")).as("sum_base_price"),
        Gate.sumMeasure(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Gate.sumMeasureSql("l_quantity")} AS sum_qty,
       |  ${Gate.sumMeasureSql("l_extendedprice")} AS sum_base_price,
       |  ${Gate.sumMeasureSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  count(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: 3-way join + agg + deterministic top-k (tie-broken on
    * the key so LIMIT is stable at any parallelism).
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy("o_orderkey")
      .agg(Gate.sumMeasure(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT o_orderkey,
       |  ${Gate.sumMeasureSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderkey
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style: 6-way join with broadcast dimensions, revenue by
    * nation. Dimension tables (supplier/nation/region/customer) broadcast;
    * only the lineitem⋈orders join shuffles.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val supp = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("n_name")
      .agg(Gate.sumMeasure(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${Gate.sumMeasureSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** TPC-H Q6-style: pure filter + scalar agg — the predicate-pushdown
    * showcase (filters reach the parquet scan).
    */
  def q6RevenueForecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-06-01") &&
        col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(Gate.sumMeasure(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q6Sql: String =
    s"""SELECT ${Gate.sumMeasureSql("l_extendedprice * l_discount")} AS revenue,
       |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= '1995-06-01' AND l_shipdate < '1996-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Window rank: top-3 customers by total order value per market segment. */
  def q7WindowTopCustomers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(Gate.sumMeasure(col("o_totalprice")).as("total_value"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("total_value").desc, col("c_custkey"))
    totals.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy("c_mktsegment", "rnk")
  }

  val q7Sql: String =
    s"""SELECT * FROM (
       |  SELECT c_mktsegment, c_custkey,
       |    ${Gate.sumMeasureSql("o_totalprice")} AS total_value,
       |    row_number() OVER (PARTITION BY c_mktsegment
       |      ORDER BY ${Gate.sumMeasureSql("o_totalprice")} DESC, c_custkey) AS rnk
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY c_mktsegment, c_custkey)
       |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin

  /** Running window frame: per-customer running order total + previous
    * order gap (lag) — exercises unbounded-preceding frames.
    */
  def q8RunningTotals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    Tables.orders(s, dir)
      .withColumn("running_total",
        Gate.microsToDouble(sum(Gate.micros(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .withColumn("prev_orderkey", lag("o_orderkey", 1).over(w))
      .select("o_custkey", "o_orderkey", "running_total", "prev_orderkey")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q8Sql: String =
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(CAST(sum(${Gate.microsSql("o_totalprice")}) OVER (
       |    PARTITION BY o_custkey ORDER BY o_orderkey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)/1000000.0 AS running_total,
       |  lag(o_orderkey, 1) OVER (
       |    PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_orderkey
       |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ROLLUP aggregation over return flag / line status. */
  def q9Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        Gate.sumMeasure(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q9Sql: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       |  ${Gate.sumMeasureSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Exact distinct counting across several columns. */
  def q10Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_orderkey")).as("d_orders"),
      countDistinct(col("l_partkey")).as("d_parts"),
      countDistinct(col("l_suppkey")).as("d_supps"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("d_flag_status"))

  val q10Sql: String =
    """SELECT count(DISTINCT l_orderkey) AS d_orders,
      |  count(DISTINCT l_partkey) AS d_parts,
      |  count(DISTINCT l_suppkey) AS d_supps,
      |  count(DISTINCT (l_returnflag, l_linestatus)) AS d_flag_status
      |FROM lineitem""".stripMargin

  /** TPC-H Q4 shape (order-priority checking): count orders per priority
    * that have at least one lineitem shipped more than 30 days after the
    * order date — correlated EXISTS with an inequality on both tables'
    * columns, planned as a left-semi join whose residual predicate rides
    * the join (no second pass over lineitem).
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val late = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    orders.join(late,
        orders("o_orderkey") === late("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Semi/anti joins: customers with large orders (EXISTS) and customers
    * with no orders at all (NOT EXISTS).
    */
  def q11SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val bigOrders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 100000)
      .select(col("o_custkey"))
    val withBig = cust.join(bigOrders,
      cust("c_custkey") === bigOrders("o_custkey"), "left_semi")
    val allOrders = Tables.orders(s, dir).select(col("o_custkey"))
    val without = cust.join(allOrders,
      cust("c_custkey") === allOrders("o_custkey"), "left_anti")
    withBig.agg(count(lit(1)).as("n_with_big_order"))
      .crossJoin(without.agg(count(lit(1)).as("n_without_orders")))
  }

  val q11Sql: String =
    """SELECT
      |  (SELECT count(*) FROM customer WHERE EXISTS (
      |     SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |       AND o_totalprice > 100000)) AS n_with_big_order,
      |  (SELECT count(*) FROM customer WHERE NOT EXISTS (
      |     SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders""".stripMargin

  /** Set operations over derived key sets: 1995 buyers vs high-balance
    * customers — union / intersect / except cardinalities.
    */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    val buyers95 = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_custkey").as("k")).distinct()
    val rich = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k")).distinct()
    buyers95.union(rich).distinct().agg(count(lit(1)).as("n_union"))
      .crossJoin(buyers95.intersect(rich).agg(count(lit(1)).as("n_intersect")))
      .crossJoin(buyers95.except(rich).agg(count(lit(1)).as("n_except")))
  }

  val q12Sql: String =
    """WITH buyers95 AS (
      |  SELECT DISTINCT o_custkey AS k FROM orders
      |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'),
      |rich AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
      |SELECT
      |  (SELECT count(*) FROM (SELECT k FROM buyers95 UNION SELECT k FROM rich)) AS n_union,
      |  (SELECT count(*) FROM (SELECT k FROM buyers95 INTERSECT SELECT k FROM rich)) AS n_intersect,
      |  (SELECT count(*) FROM (SELECT k FROM buyers95 EXCEPT SELECT k FROM rich)) AS n_except""".stripMargin

  /** Broadcast-dimension product analytics: revenue and volume by brand. */
  def q13BrandRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(
        Gate.sumMeasure(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        Gate.sumMeasure(col("l_quantity")).as("volume"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  val q13Sql: String =
    s"""SELECT p_brand,
       |  ${Gate.sumMeasureSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  ${Gate.sumMeasureSql("l_quantity")} AS volume,
       |  count(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Correlated scalar subquery (argmax per customer) — exercises
    * Catalyst's subquery decorrelation; raw double equality is exact
    * because both engines compare the same stored values.
    */
  def q15ArgmaxSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders_v o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
        |                      FROM orders_v o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  val q15Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
      |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
      |                      FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Exact percentiles with linear interpolation (Spark `percentile` ≡
    * DuckDB `quantile_cont`).
    */
  def q16Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      expr("percentile(l_quantity, 0.25)").as("p25"),
      expr("percentile(l_quantity, 0.5)").as("p50"),
      expr("percentile(l_quantity, 0.75)").as("p75"),
      expr("percentile(l_extendedprice, 0.5)").as("price_median"))

  val q16Sql: String =
    """SELECT quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.5) AS price_median
      |FROM lineitem""".stripMargin

  /** Approximate distinct counting (HLL++). The estimates are
    * engine-specific, so the GATE-CHECKED output is exact counts plus
    * error-bound booleans: the oracle asserts the bounds hold (`true`
    * literals), which fails loudly if the sketch drifts outside its rsd
    * while staying hash-comparable across engines.
    */
  def q17ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val exactOrders = countDistinct(col("l_orderkey")).cast("double")
    val exactParts = countDistinct(col("l_partkey")).cast("double")
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"),
      (abs(approx_count_distinct(col("l_orderkey")).cast("double") -
        exactOrders) / exactOrders <= 0.15).as("orders_within_15pct"),
      (abs(approx_count_distinct(col("l_partkey"), 0.01).cast("double") -
        exactParts) / exactParts <= 0.05).as("parts_within_5pct"))
  }

  val q17Sql: String =
    """SELECT count(DISTINCT l_orderkey) AS exact_orders,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  true AS orders_within_15pct,
      |  true AS parts_within_5pct
      |FROM lineitem""".stripMargin

  /** Skew-salted join: l_suppkey is heavily skewed toward 10 suppliers;
    * the salted plan spreads each hot key over 8 tasks. Results must equal
    * the plain join — the oracle is the unsalted SQL.
    */
  def q18SaltedJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedJoin(
      Tables.lineitem(s, dir), Tables.supplier(s, dir)
        .withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey", salt = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_lines"),
        Gate.sumMeasure(col("l_extendedprice")).as("revenue"))
      .orderBy("s_name")

  val q18Sql: String =
    s"""SELECT s_name, count(*) AS n_lines,
       |  ${Gate.sumMeasureSql("l_extendedprice")} AS revenue
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_name ORDER BY s_name""".stripMargin

  /** String-function surface: case mapping, substring, concat, length. */
  def q19StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(upper(substring(col("p_type"), 1, 5)).as("type_prefix"))
      .agg(count(lit(1)).as("n_parts"),
        sum(length(col("p_name"))).as("name_chars"),
        min(concat(col("p_brand"), lit("/"), col("p_type"))).as("min_brand_type"))
      .orderBy("type_prefix")

  val q19Sql: String =
    """SELECT upper(substr(p_type, 1, 5)) AS type_prefix,
      |  count(*) AS n_parts,
      |  CAST(sum(length(p_name)) AS BIGINT) AS name_chars,
      |  min(p_brand || '/' || p_type) AS min_brand_type
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin

  /** Null semantics: NULLIF / COALESCE / conditional counting. */
  def q20NullHandling(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n_total"),
      count(expr("nullif(l_returnflag, 'N')")).as("n_not_n"),
      sum(when(col("l_discount") === 0, 1).otherwise(0)).as("n_zero_disc"),
      count(expr("coalesce(nullif(l_linestatus,'O'), nullif(l_returnflag,'N'))"))
        .as("n_coalesce"))

  val q20Sql: String =
    """SELECT count(*) AS n_total,
      |  count(nullif(l_returnflag, 'N')) AS n_not_n,
      |  CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
      |  count(coalesce(nullif(l_linestatus,'O'), nullif(l_returnflag,'N'))) AS n_coalesce
      |FROM lineitem""".stripMargin

  /** Time-dimension aggregate: yearly order volume (timestamp EXTRACT). */
  def q14YearlyVolume(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(count(lit(1)).as("n_orders"),
        Gate.sumMeasure(col("o_totalprice")).as("total_value"))
      .orderBy("y")

  val q14Sql: String =
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
       |  count(*) AS n_orders,
       |  ${Gate.sumMeasureSql("o_totalprice")} AS total_value
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
}
