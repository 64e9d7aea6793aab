package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Points.table

/**
 * General analytics over the TPC-H-ish star schema — exercises the engine
 * surface the reference lacks but a Spark-native engine gets from Catalyst
 * (joins, top-k, multi-agg): broadcast joins for the small dimensions, shuffle
 * hash/sort-merge only where the fact table demands it. At 100 TB the
 * `lineitem`/`orders` joins shuffle on their keys; all dimension joins below
 * stay broadcasts (dimension size is O(SF) small).
 */
object TpchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan, partial+final hash agg.
    "q1_pricing" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(col("l_discount").cast("decimal(18,4)")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    // Join path: customer ⋈ orders ⋈ lineitem, revenue per market segment.
    // customer/nation/region are broadcast-size at any SF; orders-lineitem
    // shuffles on the order key.
    "q3_segment_revenue" -> ((s, dir) => {
      val customer = broadcast(table(s, dir, "customer"))
      val orders = table(s, dir, "orders")
      val lineitem = table(s, dir, "lineitem")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")).cast("double").as("revenue"),
          countDistinct("o_orderkey").as("order_cnt"))
    }),
    // Top-k: highest-revenue orders (deterministic tie-break on key).
    "q_topk_orders" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    // Dimension chain broadcast join: nation -> region rollup of customers.
    "q_region_customers" -> ((s, dir) => {
      val region = broadcast(table(s, dir, "region"))
      val nation = broadcast(table(s, dir, "nation"))
      table(s, dir, "customer")
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("customers"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("total_acctbal"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,
    "q3_segment_revenue" ->
      """SELECT c_mktsegment,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(DISTINCT o_orderkey) AS order_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q_topk_orders" ->
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_region_customers" ->
      """SELECT r_name, COUNT(*) AS customers, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin
  )
}
