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

  /** The verified fuzzy-pair frame shared by `link_fuzzy_pairs` and
    * `link_entities` (the BM25-family memoization pattern): one block +
    * levenshtein-verify join per (session, dir); the entity assignment then
    * only pays the components pass. Verify-bounded rows — executor-safe to
    * persist at any corpus size. */
  private val fuzzyPairsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private[queries] def fuzzyPairsFrame(s: SparkSession, dir: String): DataFrame = {
    val pairs = fuzzyPairsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.operators.Linkage.fuzzyPairs(table(s, dir, "customer"),
        "c_custkey", "c_name", blockLen = 16, maxDist = 1, maxBlock = 10000L))
    if (pairs.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs
  }

  /** Bench attribution entry for the memoized pair frame (see
    * [[LlmQueries.sharedBuilds]] for the mechanism and rationale). */
  val sharedBuilds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "shared_build_fuzzy_pairs" ->
      ((s: SparkSession, dir: String) => { fuzzyPairsFrame(s, dir).count(); () }))

  /** Scale-4 decimal sum -> double via the EXACT unscaled integer and one
    * pinned division — the [[graft.operators.Profiling]] dec6ToDouble
    * engine-parity rule at the TPC-H money scale, applied PROACTIVELY to
    * the revenue family (the round-11 audit pinned SUM(l_extendedprice) as
    * the first site to trip the 2^53 direct-cast boundary beyond ~sf2):
    * the scaled sum is an exact int64 in both engines up to ~9.2e14 money
    * units (~sf300), and the one long->double conversion + division are
    * the identical IEEE ops on identical inputs. Oracles mirror as
    * `CAST(CAST(SUM(..)*10000 AS BIGINT) AS DOUBLE)/10000.0`. */
  private def dec4ToDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c * lit(10000L)).cast("long").cast("double") / lit(10000.0)

  /** Idempotent MEMORY_AND_DISK cache for bounded intermediates read by two
    * downstream branches (the operators-package Frames.cached idiom): q2 /
    * q20 / q21 each aggregate the fact join once into a dimension-bounded
    * frame and then consume it twice — uncut, the second consumer re-ran
    * the full lineitem scan + join. */
  private def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.cache() else df

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan, partial+final hash agg.
    "q1_pricing" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dec4ToDouble(sum(col("l_quantity").cast("decimal(18,4)"))).as("sum_qty"),
          dec4ToDouble(sum(col("l_extendedprice").cast("decimal(18,4)"))).as("sum_base_price"),
          dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)"))).as("sum_disc_price"),
          (dec4ToDouble(sum(col("l_quantity").cast("decimal(18,4)"))) / count(lit(1))).as("avg_qty"),
          (dec4ToDouble(sum(col("l_discount").cast("decimal(18,4)"))) / count(lit(1))).as("avg_disc"),
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
          dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)"))).as("revenue"),
          countDistinct("o_orderkey").as("order_cnt"))
    }),
    // Top-k: highest-revenue orders (deterministic tie-break on key).
    "q_topk_orders" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    // TPC-H Q5-style local-supplier volume: the join-heaviest plan in the
    // suite — lineitem ⋈ orders ⋈ customer shuffle on their keys, supplier/
    // nation/region broadcast, the customer-nation = supplier-nation
    // colocation predicate applied as a post-join filter, and a timestamp
    // range filter that must reach the orders scan (PushedFilters).
    "q5_region_volume" -> ((s, dir) => {
      val nation = broadcast(table(s, dir, "nation"))
      val supplier = broadcast(table(s, dir, "supplier"))
      val customer = table(s, dir, "customer")
      val orders = table(s, dir, "orders")
        .where(expr("o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND " +
          "o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"))
      table(s, dir, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") === col("s_nationkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),
    // TPC-H Q12-style priority case aggregation: one fact-fact shuffle join
    // + CASE counts — the urgent-shipments-by-returnflag monitoring shape.
    "q12_priority" -> ((s, dir) => {
      val orders = table(s, dir, "orders")
      table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND " +
          "l_shipdate < TIMESTAMP '1999-01-01 00:00:00'"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"),
          count(lit(1)).as("n_lines"))
    }),
    // TPC-H Q9-flavor brand profit: lineitem ⋈ part — BOTH sides grow with
    // SF (part is fact-sized at 100 TB), so this join is the suite's
    // shuffle-join representative; no broadcast hint on purpose, AQE picks.
    "q9_brand_profit" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")))
            .as("revenue"),
          dec4ToDouble(sum(col("l_quantity").cast("decimal(18,4)"))).as("sum_qty"),
          countDistinct("l_partkey").as("n_parts"))
    }),
    // TPC-H Q10-flavor: top-10 customers by RETURNED revenue — the
    // problem-account report. Fact-fact shuffle join filtered at the scan
    // (returnflag pushdown), then a deterministic top-k.
    "q10_returned_topk" -> ((s, dir) => {
      val customer = broadcast(table(s, dir, "customer"))
      table(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")))
          .as("returned_revenue"))
        .orderBy(col("returned_revenue").desc, col("c_custkey"))
        .limit(10)
    }),
    // TPC-H Q17-flavor small-quantity revenue: each lineitem compared to
    // ITS part's average quantity — the aggregated-subquery join pattern
    // (per-part averages computed once, joined back on the part key; never
    // a correlated per-row subquery).
    "q17_small_qty" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val partAvg = li.groupBy(col("l_partkey").as("pk"))
        .agg((sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("avg_qty"))
      li.join(partAvg, col("l_partkey") === col("pk"))
        .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .join(broadcast(table(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small_lines"),
          dec4ToDouble(sum(col("l_extendedprice").cast("decimal(18,4)"))).as("small_revenue"))
    }),
    // TPC-H Q4-flavor late-order priority check: orders with ANY line shipped
    // more than 60 days after the order date — the LEFT SEMI join pattern
    // (exists, never a fan-out: an order with 7 late lines counts once). The
    // date window prunes the orders scan; the semi join shuffles both fact
    // tables on the order key with the non-equi lateness predicate evaluated
    // inside the join.
    "q4_late_orders" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .where(expr("o_orderdate >= TIMESTAMP '1996-06-01 00:00:00' AND " +
          "o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"))
      o.join(table(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),
    // TPC-H Q6-style forecast revenue: the pure scan-aggregate — every
    // predicate (date range, discount band, quantity cap) must reach the
    // parquet scan as PushedFilters; no join, no shuffle beyond the 1-row
    // final aggregate.
    "q6_forecast_revenue" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND " +
          "l_shipdate < TIMESTAMP '1998-01-01 00:00:00'") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
          col("l_discount").cast("decimal(18,4)")).cast("decimal(18,4)")))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),
    // TPC-H Q14-flavor promo share: one month of shipments joined to part,
    // conditional revenue split into a single-row ratio. Month filter at the
    // lineitem scan; the lineitem-part join is the fact-fact shuffle (part
    // grows with SF), AQE free to pick the strategy.
    "q14_promo_share" -> ((s, dir) => {
      val rev = (col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")
      table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND " +
          "l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"))
        .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          dec4ToDouble(sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,4)")))).as("promo_revenue"),
          dec4ToDouble(sum(rev)).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (col("promo_revenue") / col("total_revenue") * lit(100.0)).as("promo_pct"))
    }),
    // TPC-H Q18-flavor large-volume orders: per-order quantity rollup with a
    // selective HAVING, joined back to orders and the broadcast customer dim,
    // deterministic top-20. The quantity aggregate runs BEFORE any join, so
    // the join input is already HAVING-pruned (never join-then-aggregate).
    "q18_big_orders" -> ((s, dir) => {
      val big = table(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("total_qty"))
        .where(col("total_qty") > 200)
      big.join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("total_qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
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
    }),
    // TPC-H Q7 flavor: bilateral shipping volume between nation pairs by
    // ship year. Dims (supplier/customer/nation) broadcast; the one big
    // shuffle is lineitem x orders on the order key.
    "q7_nation_volume" -> ((s, dir) => {
      val n1 = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation")))
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("sk"))
        .join(n2, col("c_nationkey") === col("ck"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")))
          .as("revenue"))
    }),
    // TPC-H Q13: customer distribution by order count, INCLUDING the
    // zero-order customers a plain join would drop (left outer + count of
    // the nullable side).
    "q13_custdist" -> ((s, dir) => {
      val perCust = table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    }),
    // TPC-H Q15 flavor: top-5 suppliers by lineitem revenue in one ship
    // quarter, deterministic (revenue DESC, suppkey) order pinned by rank.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
          "l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)"))
          .as("rev"))
      rev.join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .orderBy(col("rev").desc, col("l_suppkey").asc)
        .limit(5)
        .select(col("l_suppkey"), col("s_name"),
          dec4ToDouble(col("rev")).as("total_revenue"))
    }),
    // TPC-H Q8 flavor: market share of one supplier nation (NATION_7)
    // inside one region's (EUROPE) customer market for one part type
    // (PROMO), by order year. Numerator and denominator are separate
    // exact-DECIMAL sums; the share divides the two doubles in the same
    // expression order as the oracle so the result is bit-exact. All six
    // dimension joins broadcast (nation/region/part/customer/supplier are
    // O(SF) small); the one corpus-sized shuffle is lineitem x orders on
    // the order key — the same single-exchange shape at any SF.
    "q8_mkt_share" -> ((s, dir) => {
      val nCust = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_regionkey").as("crk")))
      val region = broadcast(table(s, dir, "region").where(col("r_name") === "EUROPE"))
      val nSupp = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
      val vol = (col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part").where(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(nCust, col("c_nationkey") === col("ck"))
        .join(region, col("crk") === col("r_regionkey"))
        .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(nSupp, col("s_nationkey") === col("sk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          dec4ToDouble(sum(when(col("supp_nation") === "NATION_7", vol)
            .otherwise(lit(0).cast("decimal(18,4)")))).as("nation_vol"),
          dec4ToDouble(sum(vol)).as("total_vol"))
        .withColumn("mkt_share", col("nation_vol") / col("total_vol"))
    }),
    // TPC-H Q19 flavor: OR-of-ANDs (brand, size, quantity) revenue — the
    // disjunctive-pushdown case. The disjunction's common envelope (brand
    // IN the 3-element set, size <= 15, quantity <= 30) is applied to EACH
    // side before the join so both scans prune (PushedFilters carries the
    // envelope; lineitem rows outside qty [1,30] never enter the join);
    // the exact OR-of-ANDs remains as the post-join residual. part stays a
    // broadcast at any SF.
    "q19_disjunct" -> ((s, dir) => {
      val part = broadcast(table(s, dir, "part")
        .where(col("p_brand").isin("Brand#13", "Brand#23", "Brand#19") &&
          col("p_size").between(1, 15)))
      table(s, dir, "lineitem").where(col("l_quantity").between(1, 30))
        .join(part, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(
          dec4ToDouble(sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),
    // TPC-H Q21 flavor: suppliers who were the SOLE late shipper in a
    // multi-supplier order ("late" = shipped > 90 days after the order
    // date; the testdata lacks commit/receipt dates). Three keyed
    // aggregates — (order, supplier) lateness, per-order supplier/late
    // counts, per-supplier numwait — all shuffle on bounded keys; no
    // self-join of lineitem against itself (the classic Q21 EXISTS/NOT
    // EXISTS pair collapses into the per-order counts).
    "q21_waiting_supplier" -> ((s, dir) => {
      val ev = table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey").as("ok"), col("l_suppkey").as("sk"),
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
            .otherwise(0L).as("late"))
      val perSupp = cached(ev.groupBy("ok", "sk").agg(max(col("late")).as("late")))
      val perOrder = perSupp.groupBy("ok").agg(
        count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
      perSupp.where(col("late") === 1L)
        .join(perOrder, "ok")
        .where(col("n_supp") >= 2 && col("n_late") === 1L)
        .groupBy(col("sk"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(table(s, dir, "supplier")), col("sk") === col("s_suppkey"))
        .orderBy(col("numwait").desc, col("sk"))
        .limit(20)
        .select(col("sk").as("l_suppkey"), col("s_name"), col("numwait"))
    }),
    // TPC-H Q22 flavor: LAPSED customers — above-average positive balance
    // and no orders since 2000-01-01 — rolled up by market segment (this
    // schema has no phone country codes, and every customer has at least
    // one lifetime order, so the recency cutoff is what makes "idle"
    // non-trivial). The global average is a 1-row broadcast scalar; the
    // no-recent-orders test is a LEFT ANTI join shuffling on the customer
    // key — never a NOT IN materialization — with the date filter pushed
    // to the orders scan so the anti side is already pruned.
    "q22_idle_balance" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
      val avgBal = cust.where(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(table(s, dir, "orders")
          .where(expr("o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("totacctbal"))
    }),
    // TPC-H Q2 flavor: cheapest supplier per mid-size part (the testdata has
    // no partsupp, so unit cost is observed from lineitem:
    // l_extendedprice / l_quantity, one IEEE division mirrored in the
    // oracle). Min-per-group WITHOUT a corpus window: per-(part, supplier)
    // min cost (one keyed shuffle), per-part min of those (tiny second agg,
    // broadcast back), equality join on the exact double, min-suppkey
    // tie-break. part/supplier dims broadcast at any SF.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val part = broadcast(table(s, dir, "part")
        .where(col("p_size").between(10, 15))
        .select("p_partkey", "p_brand"))
      val perSupp = cached(table(s, dir, "lineitem")
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_brand"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost")))
      val perPart = perSupp.groupBy("p_partkey")
        .agg(min(col("unit_cost")).as("best_cost"))
      perSupp.join(broadcast(perPart), Seq("p_partkey"))
        .where(col("unit_cost") === col("best_cost"))
        .groupBy(col("p_partkey"), col("p_brand"), col("best_cost"))
        .agg(min(col("l_suppkey")).as("best_suppkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("best_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_brand"), col("best_suppkey"),
          col("s_name"), col("best_cost"))
        .orderBy("p_partkey").limit(25)
    }),
    // TPC-H Q11 flavor: "important stock" — parts whose observed trade value
    // through NATION_3 suppliers exceeds 2x the MEAN per-part value (classic
    // Q11's fixed fraction scales as 1/SF and empties at bench scale; the
    // mean-multiple form keeps a stable ~8-10% selectivity at every SF). The
    // threshold is a 1-row broadcast scalar (classic scalar subquery) built
    // from the exact-DECIMAL grand total and an exact distinct-part count —
    // never a sum of unsorted doubles; the 2.0*total/n arithmetic shares its
    // order with the oracle. One corpus-sized keyed shuffle on l_partkey.
    "q11_important_stock" -> ((s, dir) => {
      val supp = broadcast(table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")).where(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
      val vol = (col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")
      val base = table(s, dir, "lineitem")
        .join(supp, col("l_suppkey") === col("s_suppkey"))
      // one fact pass: the grand total is the exact DECIMAL sum of the
      // per-part partials and n_parts the non-null group count — both
      // bit-identical to the direct aggregation over the join (associative
      // decimal sums; countDistinct == count of grouped non-null keys), so
      // the scalar no longer re-runs the lineitem scan + join
      val perPart0 = cached(base.groupBy(col("l_partkey")).agg(sum(vol).as("pv_dec")))
      val perPart = perPart0.select(col("l_partkey"),
        col("pv_dec").cast("double").as("part_value"))
      val total = perPart0.agg(sum(col("pv_dec")).cast("double").as("total_value"),
        count(col("l_partkey")).as("n_parts"))
      perPart.crossJoin(broadcast(total))
        .where(col("part_value") > lit(2.0) * col("total_value") / col("n_parts"))
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey")).limit(25)
    }),
    // TPC-H Q16 flavor: distinct-supplier counts per (brand, type, size)
    // excluding "at-risk" suppliers (acctbal < 1000 — the comment-pattern
    // exclusion of classic Q16, re-keyed to the testdata's columns). The
    // exclusion is a broadcast LEFT ANTI join; supplier-part relations come
    // from lineitem (no partsupp), count-distinct shuffles once on the
    // grouping key.
    "q16_supplier_cnt" -> ((s, dir) => {
      val excluded = broadcast(table(s, dir, "supplier")
        .where(col("s_acctbal") < 1000.0).select(col("s_suppkey").as("xk")))
      val part = broadcast(table(s, dir, "part")
        .where(col("p_brand") =!= "Brand#45" && col("p_size").isin(1, 4, 7, 10, 15, 20, 25, 30))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
      table(s, dir, "lineitem")
        .join(part, col("l_partkey") === col("p_partkey"))
        .join(excluded, col("l_suppkey") === col("xk"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
        .limit(20)
    }),
    // TPC-H Q20 flavor: suppliers holding an outsized share of a part's
    // flow — for widget parts in 1998, (part, supplier) pairs whose shipped
    // quantity exceeds 30% of the part's total, then the DISTINCT suppliers
    // via semi-join. Two keyed aggregates (composite key, then part key) and
    // a broadcast join back; the share compare mirrors the oracle's multiply
    // order. No correlated-subquery rescan — the per-part totals frame IS
    // the subquery, computed once.
    "q20_excess_suppliers" -> ((s, dir) => {
      val part = broadcast(table(s, dir, "part")
        .where(col("p_name").endsWith("widget")).select("p_partkey"))
      val li = table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(part, col("l_partkey") === col("p_partkey"))
      // one fact pass: the per-part total is the exact DECIMAL sum of the
      // per-(part, supplier) partials (associative integer-scaled decimals,
      // so the cast-to-double values are bit-identical to a direct
      // aggregation) — deriving it from the cached pair frame removes the
      // second lineitem scan + join
      val perPair0 = cached(li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sq_dec")))
      val perPair = perPair0.select(col("l_partkey"), col("l_suppkey"),
        col("sq_dec").cast("double").as("supp_qty"))
      val perPart = perPair0.groupBy(col("l_partkey"))
        .agg(sum(col("sq_dec")).cast("double").as("part_qty"))
      perPair.join(broadcast(perPart), Seq("l_partkey"))
        .where(col("supp_qty") > col("part_qty") * 0.3)
        .select(col("l_suppkey")).distinct()
        .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy("l_suppkey")
    }),
    // Blocked fuzzy record linkage over customer names: 16-char-prefix +
    // length blocks, levenshtein <= 1 verify — the entity-resolution
    // candidate step (block -> verify, never corpus x corpus).
    "link_fuzzy_pairs" -> ((s, dir) => fuzzyPairsFrame(s, dir)),
    // Entity ids over the fuzzy pairs: Dedup.clusters min-label components,
    // singletons keep their own id — riding the SHARED verified-pair frame.
    "link_entities" -> ((s, dir) =>
      graft.operators.Linkage.entitiesFromPairs(table(s, dir, "customer"),
        fuzzyPairsFrame(s, dir), "c_custkey", "c_name"))
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_qty,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_base_price,
        |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_qty,
        |       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,
    "q3_segment_revenue" ->
      """SELECT c_mktsegment,
        |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
        |       COUNT(DISTINCT o_orderkey) AS order_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q_topk_orders" ->
      """SELECT l_orderkey,
        |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_region_customers" ->
      """SELECT r_name, COUNT(*) AS customers, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,
    "q5_region_volume" ->
      """SELECT n_name,
        |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE c_nationkey = s_nationkey
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q12_priority" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q17_small_qty" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_small_lines,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS small_revenue
        |FROM lineitem
        |JOIN pa ON l_partkey = pa.pk
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < 0.5 * avg_qty
        |GROUP BY 1""".stripMargin,
    "q10_returned_topk" ->
      """SELECT c_custkey, c_mktsegment,
        |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS returned_revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2
        |ORDER BY returned_revenue DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q4_late_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q14_promo_share" ->
      """WITH a AS (
        |  SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                       THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |                       ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS promo_revenue,
        |         CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS total_revenue
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00')
        |SELECT promo_revenue, total_revenue,
        |       promo_revenue / total_revenue * 100 AS promo_pct
        |FROM a""".stripMargin,
    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200)
        |SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(total_qty AS DOUBLE) AS total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q9_brand_profit" ->
      """SELECT p_brand,
        |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_qty,
        |       COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    // mirrors q7_nation_volume: nation-pair bilateral revenue by ship year,
    // exact-decimal revenue sums
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |            (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,
    // mirrors q13_custdist: zero-order customers kept by the left join,
    // COUNT of the nullable order key
    "q13_custdist" ->
      """WITH pc AS (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY 1""".stripMargin,
    // mirrors q15_top_supplier: 1996Q1 revenue per supplier, deterministic
    // (revenue DESC, suppkey) top 5
    "q15_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |             (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT l_suppkey, s_name, CAST(CAST(rev * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS total_revenue
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY rev DESC, l_suppkey ASC
        |LIMIT 5""".stripMargin,
    // mirrors q8_mkt_share: numerator/denominator as separate exact-DECIMAL
    // sums, the share dividing the two doubles in the same order
    "q8_mkt_share" ->
      """WITH base AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |              (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS vol,
        |         n1.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey)
        |SELECT o_year,
        |       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS nation_vol,
        |       CAST(CAST(SUM(vol) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS total_vol,
        |       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 /
        |       (CAST(CAST(SUM(vol) * 10000 AS BIGINT) AS DOUBLE) / 10000.0) AS mkt_share
        |FROM base GROUP BY 1""".stripMargin,
    // mirrors q19_disjunct: the OR-of-ANDs evaluated verbatim (the Spark
    // side's envelope prefilter is a strict superset, so results agree)
    "q19_disjunct" ->
      """SELECT CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |            (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // mirrors q21_waiting_supplier: sole-late-supplier in multi-supplier
    // orders via per-order counts (no lineitem self-join)
    "q21_waiting_supplier" ->
      """WITH ev AS (
        |  SELECT o_orderkey AS ok, l_suppkey AS sk,
        |         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |ps AS (SELECT ok, sk, MAX(late) AS late FROM ev GROUP BY 1, 2),
        |po AS (SELECT ok, CAST(COUNT(*) AS BIGINT) AS n_supp, SUM(late) AS n_late FROM ps GROUP BY 1),
        |w AS (
        |  SELECT ps.sk, CAST(COUNT(*) AS BIGINT) AS numwait
        |  FROM ps JOIN po USING (ok)
        |  WHERE ps.late = 1 AND po.n_supp >= 2 AND po.n_late = 1
        |  GROUP BY 1)
        |SELECT w.sk AS l_suppkey, s_name, numwait
        |FROM w JOIN supplier ON w.sk = s_suppkey
        |ORDER BY numwait DESC, w.sk LIMIT 20""".stripMargin,
    // mirrors q22_idle_balance: 1-row scalar average, NOT EXISTS == the
    // anti join, exact-decimal segment totals
    "q22_idle_balance" ->
      """WITH ab AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > ab.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1""".stripMargin,
    // mirrors q2_min_cost_supplier: same division order, min-per-group via
    // a grouped min joined back on the exact double
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT p_partkey, p_brand, l_suppkey,
        |         MIN(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size BETWEEN 10 AND 15
        |  GROUP BY 1, 2, 3),
        |pp AS (SELECT p_partkey, MIN(unit_cost) AS best_cost FROM ps GROUP BY 1),
        |w AS (
        |  SELECT ps.p_partkey, ps.p_brand, pp.best_cost,
        |         MIN(ps.l_suppkey) AS best_suppkey
        |  FROM ps JOIN pp ON ps.p_partkey = pp.p_partkey
        |           AND ps.unit_cost = pp.best_cost
        |  GROUP BY 1, 2, 3)
        |SELECT w.p_partkey, w.p_brand, w.best_suppkey, s_name, w.best_cost
        |FROM w JOIN supplier ON w.best_suppkey = s_suppkey
        |ORDER BY w.p_partkey LIMIT 25""".stripMargin,
    // mirrors q11_important_stock: 1-row scalar (exact-decimal total +
    // distinct part count), mirrored 2.0*total/n threshold arithmetic
    "q11_important_stock" ->
      """WITH base AS (
        |  SELECT l_partkey,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |              (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS vol
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'),
        |pp AS (SELECT l_partkey, CAST(SUM(vol) AS DOUBLE) AS part_value FROM base GROUP BY 1),
        |t AS (SELECT CAST(SUM(vol) AS DOUBLE) AS total_value,
        |             COUNT(DISTINCT l_partkey) AS n_parts FROM base)
        |SELECT l_partkey, part_value
        |FROM pp, t
        |WHERE part_value > 2.0 * total_value / n_parts
        |ORDER BY part_value DESC, l_partkey LIMIT 25""".stripMargin,
    // mirrors q16_supplier_cnt: NOT IN as anti-join semantics (acctbal
    // exclusion), distinct-supplier count from lineitem relations
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 20""".stripMargin,
    // mirrors q20_excess_suppliers: per-part totals as an uncorrelated CTE,
    // share compare with the same multiply order
    "q20_excess_suppliers" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey, l_quantity
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%widget'
        |    AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'),
        |pair AS (SELECT l_partkey, l_suppkey,
        |                CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS supp_qty
        |         FROM li GROUP BY 1, 2),
        |pt AS (SELECT l_partkey,
        |              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS part_qty
        |       FROM li GROUP BY 1)
        |SELECT DISTINCT pair.l_suppkey, s_name, s_acctbal
        |FROM pair JOIN pt ON pair.l_partkey = pt.l_partkey
        |JOIN supplier ON pair.l_suppkey = s_suppkey
        |WHERE supp_qty > part_qty * 0.3
        |ORDER BY pair.l_suppkey""".stripMargin,
    // mirrors Linkage.fuzzyPairs(blockLen=16, maxDist=1): prefix+length
    // blocks, DuckDB's levenshtein (identical unit-cost DP to Spark's)
    "link_fuzzy_pairs" ->
      """WITH k AS (
        |  SELECT c_custkey AS id, c_name AS name,
        |         substr(c_name, 1, 16) AS bk, length(c_name) AS bl
        |  FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL)
        |SELECT x.id AS id_a, y.id AS id_b, x.name AS name_a, y.name AS name_b,
        |       CAST(levenshtein(x.name, y.name) AS BIGINT) AS dist
        |FROM k x JOIN k y ON x.bk = y.bk AND x.bl = y.bl AND x.id < y.id
        |WHERE levenshtein(x.name, y.name) <= 1""".stripMargin,
    // mirrors Linkage.entities: the same pair frame, then the repo-standard
    // recursive reachability closure -> min-id component labels; singletons
    // (no pair membership) keep their own id
    "link_entities" ->
      """WITH RECURSIVE k AS (
        |  SELECT c_custkey AS id, c_name AS name,
        |         substr(c_name, 1, 16) AS bk, length(c_name) AS bl
        |  FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL),
        |p AS (
        |  SELECT x.id AS a, y.id AS b
        |  FROM k x JOIN k y ON x.bk = y.bk AND x.bl = y.bl AND x.id < y.id
        |  WHERE levenshtein(x.name, y.name) <= 1),
        |edges AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS id, MIN(dst) AS cluster_id FROM reach GROUP BY 1)
        |SELECT k.id, k.name, COALESCE(comp.cluster_id, k.id) AS entity_id
        |FROM k LEFT JOIN comp ON k.id = comp.id""".stripMargin
  )
}
