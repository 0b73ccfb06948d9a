package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graft.MoneyDecimal.moneyDecimal

import graft.core.Tables
import Catalog._

/** Core relational surface: scans, filters, joins (all shapes), aggregates,
  * grouping sets, windows, set ops, sort/limit — SURVEY.md §2B rows 1-28.
  *
  * Scale notes (100 TB design point):
  *  - Dimension tables (region/nation/part/supplier) are broadcast — no
  *    shuffle on the fact side of those joins.
  *  - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key once;
  *    group-bys ride AQE-coalesced shuffle partitions.
  *  - All aggregates are partial-agg friendly (sum/count/min/max over
  *    decimal-cast inputs), so map-side combine does the heavy lifting.
  *  - No collect(), no driver-side loops; every query is one lazy plan.
  */
object Relational extends QueryGroup {

  // TPC-H Q1-style pricing summary: full lineitem scan, 6 aggregates,
  // map-side partial agg collapses 60k (or 600M) rows to ~6 groups.
  private def aggPricing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= ts("1998-09-01"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // TPC-H Q6-style: tight filter + single scalar agg; predicate pushes to
  // the parquet row-group level (verified via explain: PushedFilters).
  private def aggFilterRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
        $"l_discount" >= 0.02 && $"l_discount" <= 0.06 && $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // Row-level filter + projection: raw columns land bit-exact from parquet.
  private def filterProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_quantity" > 45.0 && $"l_returnflag" === "R")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice",
        ($"l_extendedprice" * $"l_discount").as("disc_amount"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // Star join: fact → orders → customer → nation → region, dims broadcast.
  private def joinStar(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = broadcast(Tables.nation(s, d))
    val r = broadcast(Tables.region(s, d))
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(n, $"c_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  // Left outer join: customers with zero orders survive with count 0.
  private def joinLeft(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("n_orders"),
        dsum(coalesce($"o_totalprice", lit(0.0))).as("total_spend"))
      .orderBy($"c_custkey")
  }

  // Full outer join of two aggregated sides on nationkey.
  private def joinFull(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cn = Tables.customer(s, d).groupBy($"c_nationkey".as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(s, d).groupBy($"s_nationkey".as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, Seq("nk"), "full")
      .select($"nk", coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nk")
  }

  // Left semi join (EXISTS): customers having a high-value order.
  private def joinSemi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables.orders(s, d).filter($"o_totalprice" > 400000.0)
    Tables.customer(s, d)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  // Left anti join (NOT EXISTS): customers with no urgent order.
  private def joinAnti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  // Cross join of two tiny dims (the only safe cross-join shape at scale).
  private def joinCross(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.region(s, d).select($"r_name")
      .crossJoin(Tables.nation(s, d).select($"n_name"))
      .orderBy($"r_name", $"n_name")
  }

  // Explicit broadcast-hint join: part is the small build side.
  private def joinBroadcast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = broadcast(Tables.part(s, d).filter($"p_size" < 10))
    Tables.lineitem(s, d)
      .join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"p_brand")
  }

  // Equi + range (theta) join: quantity within a band around part size.
  private def joinRange(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = broadcast(Tables.part(s, d))
    Tables.lineitem(s, d)
      .join(p, $"l_partkey" === $"p_partkey" &&
        $"l_quantity" >= $"p_size" - 5 && $"l_quantity" <= $"p_size" + 5)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"p_brand")
  }

  // Exact distinct counts (shuffle on expand; OK — declared exact variant).
  private def aggDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey").as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  // ROLLUP with grouping level disambiguated via coalesce to 'ALL'.
  //
  // Classic rollup decomposition: ROLLUP directly over the fact table
  // plans an Expand that duplicates EVERY input row once per grouping
  // set (3x the fact rows through the hash aggregate). count and the
  // exact decimal sum are both re-aggregable, so aggregate to the
  // finest grain (l_returnflag, l_linestatus — a handful of rows) in
  // ONE ordinary scan-shaped pass, then run the ROLLUP over that
  // collapsed relation: the Expand now multiplies ~6 rows, not the
  // fact table. The partial sum stays DECIMAL until after the re-agg
  // (sum-of-exact-sums == one exact sum; the double cast happens once,
  // at the end), so values are bit-identical to the direct form.
  private def aggRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("pn"),
        sum(moneyDecimal($"l_quantity")).as("ps"))
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"pn").as("n_rows"), sum($"ps").cast("double").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rflag"),
        coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
        $"n_rows", $"sum_qty")
      .orderBy($"rflag", $"lstatus")
  }

  // CUBE over two dims — same finest-grain-first decomposition as
  // aggRollup (the Expand quadruples rows under CUBE, so collapsing to
  // the (status, priority) grain first matters even more).
  private def aggCube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("pn"),
        sum(moneyDecimal($"o_totalprice")).as("ps"))
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(sum($"pn").as("n_orders"), sum($"ps").cast("double").as("sum_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"sum_price")
      .orderBy($"status", $"priority")
  }

  // max_by / min_by keyed by the unique orderkey (deterministic).
  private def aggMaxBy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(max_by($"o_orderstatus", $"o_orderkey").as("last_status"),
        min_by($"o_orderstatus", $"o_orderkey").as("first_status"),
        max($"o_orderkey").as("max_orderkey"),
        min($"o_orderkey").as("min_orderkey"))
      .orderBy($"o_custkey")
  }

  // Sorted group-concat (collect_list + array_sort at the agg boundary).
  private def aggCollectSorted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, d)
      .groupBy($"n_regionkey")
      .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy($"n_regionkey")
  }

  // Ranking window functions with a deterministic composite order. All four
  // windows are partitioned by o_custkey — a global (partitionless) window
  // would funnel every row through one task at 100 TB, so ntile quartiles
  // are per-customer here; global quantiles belong to approx_percentile
  // cutpoints + a broadcast range compare instead.
  private def windowRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy($"o_custkey", $"rn")
  }

  // lag / lead / first / last over an event-ordered per-customer window.
  private def windowLag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        first($"o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("first_price"),
        last($"o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("last_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  // Running sum frame (rowsBetween unboundedPreceding..currentRow) over an
  // exact decimal cast so the running total is order-exact cross-engine.
  private def windowFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey",
        sum(moneyDecimal($"o_totalprice")).over(w).cast("double")
          .as("running_spend"),
        count(lit(1)).over(w).as("running_orders"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  // Top-K per group via row_number (correct path; perf kernel is a
  // TypedImperativeAggregate if bench ever shows this dominating).
  private def topKPerGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  // Global multi-key sort + limit (TakeOrderedAndProject at the physical
  // level — no full sort materialization).
  private def sortLimit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  // UNION ALL of two projections then re-aggregate.
  private def unionAllAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
      .select($"c_nationkey".as("nk"), lit("customer").as("side"))
    val p = Tables.supplier(s, d)
      .select($"s_nationkey".as("nk"), lit("supplier").as("side"))
    c.unionByName(p)
      .groupBy($"nk", $"side")
      .agg(count(lit(1)).as("n"))
      .orderBy($"nk", $"side")
  }

  // INTERSECT (distinct semantics) of key sets.
  private def intersectKeys(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".as("nk"))
    val p = Tables.supplier(s, d).select($"s_nationkey".as("nk"))
    c.intersect(p).orderBy($"nk")
  }

  // EXCEPT: customers with orders but none in final 'F' status.
  private def exceptKeys(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = Tables.orders(s, d).select($"o_custkey".as("ck"))
    val fin = Tables.orders(s, d).filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("ck"))
    all.except(fin).orderBy($"ck")
  }

  // Full-row distinct (dropDuplicates across the projected key pair).
  private def distinctPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // Correlated-style subquery (decorrelated by Catalyst): orders above
  // their customer's average order value.
  private def subqueryAboveAvg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val avgPer = o.groupBy($"o_custkey".as("ck"))
      .agg(davg($"o_totalprice").as("avg_price"))
    o.join(avgPer, $"o_custkey" === $"ck")
      .filter($"o_totalprice" > $"avg_price" * 1.5)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_pricing" -> aggPricing,
    "q_agg_filter_revenue" -> aggFilterRevenue,
    "q_filter_project" -> filterProject,
    "q_join_star" -> joinStar,
    "q_join_left" -> joinLeft,
    "q_join_full" -> joinFull,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_cross" -> joinCross,
    "q_join_broadcast" -> joinBroadcast,
    "q_join_range" -> joinRange,
    "q_agg_distinct" -> aggDistinct,
    "q_agg_rollup" -> aggRollup,
    "q_agg_cube" -> aggCube,
    "q_agg_maxby" -> aggMaxBy,
    "q_agg_collect_sorted" -> aggCollectSorted,
    "q_window_rank" -> windowRank,
    "q_window_lag" -> windowLag,
    "q_window_frame" -> windowFrame,
    "q_topk_per_group" -> topKPerGroup,
    "q_sort_limit" -> sortLimit,
    "q_union_all_agg" -> unionAllAgg,
    "q_intersect" -> intersectKeys,
    "q_except" -> exceptKeys,
    "q_distinct_pairs" -> distinctPairs,
    "q_subquery_above_avg" -> subqueryAboveAvg,
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_filter_revenue" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_extendedprice * l_discount AS disc_amount
        |FROM lineitem
        |WHERE l_quantity > 45.0 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_star" ->
      s"""SELECT r_name, n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,
    "q_join_left" ->
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         |  ${dsumSql("COALESCE(o_totalprice, 0.0)")} AS total_spend
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name
         |ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT COALESCE(c.nk, s.nk) AS nk,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_broadcast" ->
      s"""SELECT p_brand, COUNT(*) AS n_items,
         |  ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size < 10
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_range" ->
      s"""SELECT p_brand, COUNT(*) AS n_items, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |  AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
         |  COALESCE(l_linestatus, 'ALL') AS lstatus,
         |  COUNT(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY rflag, lstatus""".stripMargin,
    "q_agg_cube" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
    "q_agg_maxby" ->
      """SELECT o_custkey, max_by(o_orderstatus, o_orderkey) AS last_status,
        |  min_by(o_orderstatus, o_orderkey) AS first_status,
        |  MAX(o_orderkey) AS max_orderkey, MIN(o_orderkey) AS min_orderkey
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_agg_collect_sorted" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        |  last_value(o_totalprice) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend,
        |  COUNT(*) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_union_all_agg" ->
      """SELECT nk, side, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk, 'supplier' AS side FROM supplier) u
        |GROUP BY nk, side ORDER BY nk, side""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_except" ->
      """SELECT o_custkey AS ck FROM orders
        |EXCEPT
        |SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY ck""".stripMargin,
    "q_distinct_pairs" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_subquery_above_avg" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM orders JOIN (
         |  SELECT o_custkey AS ck, ${davgSql("o_totalprice")} AS avg_price
         |  FROM orders GROUP BY o_custkey) a
         |ON o_custkey = ck
         |WHERE o_totalprice > avg_price * 1.5
         |ORDER BY o_orderkey""".stripMargin,
  )
}
