package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDef._

/** The specified analytical query surface of the reference
  * (point / range / aggregation / join / top-k — see
  * reference `specs/001-mongodb-cdc-delta/spec.md:307-311` and SURVEY.md
  * §2.5–§2.7), expressed with the declarative DataFrame API so Catalyst
  * performs pushdown, pruning and join-strategy selection.
  *
  * Scale notes (100 TB design target):
  *   - filters are applied directly on the scanned columns so they reach
  *     the parquet reader (`PushedFilters`);
  *   - dimension tables (region/nation/customer at TPC-H shape) are
  *     broadcast explicitly where they are guaranteed small relative to
  *     the fact side, avoiding a shuffle of the fact table;
  *   - aggregations are plain groupBy → partial+final hash aggregate
  *     (map-side combine), nothing collects to the driver.
  */
object Relational {

  /** q01 — TPC-H Q1-style pricing summary (A1 aggregation class). */
  def q01(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumD("l_quantity").as("sum_qty"),
        sumD("l_extendedprice").as("sum_base_price"),
        sumD("l_extendedprice * (1 - l_discount)", 8).as("sum_disc_price"),
        sumD("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 8)
          .as("sum_charge"),
        avgD("l_quantity").as("avg_qty"),
        avgD("l_discount", 8).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${oSumD("l_quantity")} AS sum_qty,
       |  ${oSumD("l_extendedprice")} AS sum_base_price,
       |  ${oSumD("l_extendedprice * (1 - l_discount)", 8)} AS sum_disc_price,
       |  ${oSumD("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 8)} AS sum_charge,
       |  ${oAvgD("l_quantity")} AS avg_qty,
       |  ${oAvgD("l_discount", 8)} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — point lookup by primary key (spec.md:308 point-query class).
    * At scale this is a partition-prunable / file-skippable scan. */
  def q02(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") === 100L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        // naive µs timestamp on both sides (DuckDB timestamps are naive)
        col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
        col("o_orderpriority"))

  val q02Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey = 100""".stripMargin

  /** q03 — range scan + arithmetic aggregate (TPC-H Q6 / range class). */
  def q03(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.09) &&
        col("l_quantity") < 24)
      .agg(sumD("l_extendedprice * l_discount", 8).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q03Sql: String =
    s"""SELECT ${oSumD("l_extendedprice * l_discount", 8)} AS revenue,
       |  COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.02 AND 0.09
       |  AND l_quantity < 24""".stripMargin

  /** q04 — multi-way equi-join + aggregation (J1). Dimensions are
    * broadcast (region/nation/customer ≪ orders at any SF), so the only
    * shuffle is the final group-by. */
  def q04(s: SparkSession, dir: String): DataFrame = {
    val region = Tables(s, dir, "region")
    val nation = Tables(s, dir, "nation")
    val cust = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sumD("o_totalprice").as("total_revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q04Sql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS n_orders,
       |  ${oSumD("o_totalprice")} AS total_revenue
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** q05 — top-k by aggregate (W3, TakeOrderedAndProject at scale). */
  def q05(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sumD("o_totalprice").as("total_spent"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("o_custkey"))
      .limit(10)

  val q05Sql: String =
    s"""SELECT o_custkey, ${oSumD("o_totalprice")} AS total_spent,
       |  COUNT(*) AS n_orders
       |FROM orders GROUP BY o_custkey
       |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin

  /** q06 — ranking window (W6): top-3 orders per customer. */
  def q06(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  val q06Sql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  /** q07 — exact distinct counts (A6). Expand-based multi-distinct in
    * Spark; still one shuffle keyed on the group column. */
  def q07(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q07Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q08 — anti join / set difference (W4): customers with no orders. */
  def q08(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  /** q09 — semi join (EXISTS): customers with a finished order, by segment. */
  def q09(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val fOrders = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    cust.join(fOrders, cust("c_custkey") === fOrders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val q09Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q10 — ROLLUP hierarchy totals (grouping sets; free via Catalyst). */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val nation = Tables(s, dir, "nation")
    val region = Tables(s, dir, "region")
    cust
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumD("c_acctbal").as("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  val q10Sql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
       |  ${oSumD("c_acctbal")} AS sum_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** q11 — distinct set union (W5). */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val fromOrders = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val negBal = Tables(s, dir, "customer")
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    fromOrders.union(negBal).distinct().orderBy(col("custkey"))
  }

  val q11Sql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |UNION
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
      |ORDER BY custkey""".stripMargin

  /** q12 — conditional aggregation (CASE buckets; P1-style classifier). */
  def q12(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"),
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L))
          .as("n_accepted"),
        sum(when(col("l_returnflag") === "N", 1L).otherwise(0L))
          .as("n_neutral"),
        sumD("CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END")
          .as("big_qty_price"))
      .orderBy(col("l_linestatus"))

  val q12Sql: String =
    s"""SELECT l_linestatus,
       |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_neutral,
       |  ${oSumD("CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END")} AS big_qty_price
       |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** q13 — correlated-style subquery (TPC-H Q17 shape): lineitems well
    * below their part's average quantity. Expressed as join against a
    * pre-aggregated per-part average — the decorrelation Catalyst would
    * do anyway, with the small aggregate side broadcast. */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val avgPerPart = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(avgD("l_quantity").as("avg_qty"))
    li.join(broadcast(avgPerPart),
        li("l_partkey") === avgPerPart("ap_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg((sumD("l_extendedprice") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  val q13Sql: String =
    s"""SELECT ${oSumD("l_extendedprice")} / 7.0 AS avg_yearly,
       |  COUNT(*) AS n_rows
       |FROM lineitem l
       |JOIN (SELECT l_partkey AS ap_partkey,
       |        ${oAvgD("l_quantity")} AS avg_qty
       |      FROM lineitem GROUP BY l_partkey) a
       |  ON l.l_partkey = a.ap_partkey
       |WHERE l.l_quantity < a.avg_qty * 0.5""".stripMargin

  /** q14 — calendar bucketing (date functions; partition-key shape at
    * scale: month is the natural partition column for orders). */
  def q14(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        sumD("o_totalprice").as("revenue"))
      .orderBy(col("order_month"))

  val q14Sql: String =
    s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       |  COUNT(*) AS n_orders, ${oSumD("o_totalprice")} AS revenue
       |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin

  /** q15 — string expression surface (§2.8): all codegen built-ins. */
  def q15(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 100)
      .select(
        col("p_partkey"),
        upper(col("p_type")).as("type_upper"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_brand"), "Brand#", "B").as("brand_short"))
      .orderBy(col("p_partkey"))

  val q15Sql: String =
    """SELECT p_partkey, UPPER(p_type) AS type_upper,
      |  SUBSTRING(p_name, 1, 5) AS name_prefix,
      |  LENGTH(p_name) AS name_len,
      |  CONCAT_WS('/', p_brand, p_type) AS brand_type,
      |  REGEXP_REPLACE(p_brand, 'Brand#', 'B') AS brand_short
      |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin

  /** q16 — join + HAVING-style post-aggregation filter. */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables(s, dir, "supplier")
    val nation = Tables(s, dir, "nation")
    supp.join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"), sumD("s_acctbal").as("total_bal"))
      .filter(col("n_suppliers") >= 2)
      .orderBy(col("n_name"))
  }

  val q16Sql: String =
    s"""SELECT n_name, COUNT(*) AS n_suppliers,
       |  ${oSumD("s_acctbal")} AS total_bal
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name HAVING COUNT(*) >= 2 ORDER BY n_name""".stripMargin

  /** q17 — big fact-to-fact join (orders ⋈ lineitem): the shuffle-heavy
    * class. Both sides hash-partition on the join key; AQE coalesces. */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") =!= "O")
    val li = Tables(s, dir, "lineitem")
    orders.join(li, orders("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sumD("l_extendedprice * (1 - l_discount)", 8).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q17Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  ${oSumD("l_extendedprice * (1 - l_discount)", 8)} AS revenue
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderstatus <> 'O'
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_point_lookup", q02, Some(q02Sql)),
    QueryDef("q03_range_revenue", q03, Some(q03Sql)),
    QueryDef("q04_join_region_revenue", q04, Some(q04Sql)),
    QueryDef("q05_topk_customers", q05, Some(q05Sql)),
    QueryDef("q06_window_rank", q06, Some(q06Sql)),
    QueryDef("q07_distinct_counts", q07, Some(q07Sql)),
    QueryDef("q08_anti_join", q08, Some(q08Sql)),
    QueryDef("q09_semi_join", q09, Some(q09Sql)),
    QueryDef("q10_rollup", q10, Some(q10Sql)),
    QueryDef("q11_union_distinct", q11, Some(q11Sql)),
    QueryDef("q12_case_agg", q12, Some(q12Sql)),
    QueryDef("q13_subquery_avg", q13, Some(q13Sql)),
    QueryDef("q14_monthly_orders", q14, Some(q14Sql)),
    QueryDef("q15_string_funcs", q15, Some(q15Sql)),
    QueryDef("q16_having", q16, Some(q16Sql)),
    QueryDef("q17_fact_join", q17, Some(q17Sql)))
}
