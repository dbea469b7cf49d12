package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDef._

/** Temporal join operators beyond the reference's surface (SURVEY.md
  * §2.5 north star): as-of join via the union+window merge pattern
  * (no range cross-product — one shuffle on the key) and a banded
  * range join (equi key + time-band predicate). */
object TemporalQ {

  /** q47 — as-of join: for every purchase event, the latest click of
    * the same user at-or-before the purchase. Union+window: right rows
    * (clicks) sort before left rows (purchases) at equal timestamps,
    * `last(ignoreNulls)` carries the click forward. */
  def q47(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        when(col("event_type") === "click", col("event_id"))
          .as("click_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_click_id",
        last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("prev_click_id"))
      .orderBy(col("event_id"))
  }

  val q47Sql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type,
      |    CASE WHEN event_type = 'click' THEN event_id END AS click_id
      |  FROM events WHERE event_type IN ('click', 'purchase'))
      |SELECT user_id, event_id, prev_click_id FROM (
      |  SELECT user_id, event_id, event_type,
      |    LAST_VALUE(click_id IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS prev_click_id
      |  FROM ev) t
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** q48 — banded range join: lineitems shipped within 60 days of
    * their order's date (equi key + range band). Catalyst keeps the
    * equi part as the join key; the band is a post-join filter — at
    * scale the shuffle is still keyed, never a cross product. */
  def q48(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"),
        col("l_extendedprice"))
    orders.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") +
          expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast_items"),
        sumD("l_extendedprice").as("fast_revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q48Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_fast_items,
       |  ${oSumD("l_extendedprice")} AS fast_revenue
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  AND l_shipdate >= o_orderdate
       |  AND l_shipdate < o_orderdate + INTERVAL 60 DAY
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q49 — exact percentiles (median + IQR): Spark `percentile` and
    * DuckDB `quantile_cont` both linearly interpolate on the sorted
    * values (identical double formula on identical inputs). */
  def q49(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
      .orderBy(col("l_returnflag"))

  val q49Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
      |  quantile_cont(l_extendedprice, 0.75) AS p75_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q50 — fuzzy string matching via edit distance (dedup class):
    * near-identical part names within a blocking key (last name token)
    * at Levenshtein distance ≤ 2. Identical DP algorithm in both
    * engines; the blocking bounds the pair space like LSH does for
    * documents. */
  def q50(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables(s, dir, "part")
      .filter(col("p_partkey") < 1000)
      .select(col("p_partkey"), col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("blk"))
    val a = parts.select(col("p_partkey").as("a_key"),
      col("p_name").as("a_name"), col("blk"))
    val b = parts.select(col("p_partkey").as("b_key"),
      col("p_name").as("b_name"), col("blk").as("bblk"))
    a.join(b, col("blk") === col("bblk") && col("a_key") < col("b_key"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist").between(1, 2)) // 0 ⇔ identical names
      .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"),
        col("dist"))
      .orderBy(col("a_key"), col("b_key"))
  }

  val q50Sql: String =
    """WITH p AS (SELECT p_partkey, p_name,
      |    string_split(p_name, ' ')[-1] AS blk
      |  FROM part WHERE p_partkey < 1000)
      |SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
      |  a.p_name AS a_name, b.p_name AS b_name,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM p a JOIN p b
      |  ON a.blk = b.blk AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
      |ORDER BY a_key, b_key""".stripMargin

  /** q125 — the reusable `ext.AsOfJoin` OPERATOR under the oracle
    * gate (q47 proves the semantics via an inline window; this row
    * proves the packaged operator — struct carry, tie rule, null
    * handling — against DuckDB's NATIVE `ASOF LEFT JOIN`, an
    * independent formulation, not a mirror of our plan). For every
    * click, the most recent purchase by the same user at-or-before
    * the click. (user_id, ts) is unique in the events table, so the
    * matched row is well-defined. */
  def q125(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("user_id"), col("value").as("p_value"))
    graft.ext.AsOfJoin(clicks, purchases, "user_id", "ts", "p_ts")
      .select(col("event_id"), col("user_id"),
        col("_asof.p_event_id").as("purchase_id"),
        col("_asof.p_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }

  val q125Sql: String =
    """WITH c AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
      |    FROM events WHERE event_type = 'click'),
      |  p AS (SELECT event_id AS p_event_id,
      |    CAST(ts AS TIMESTAMP) AS p_ts, user_id, value AS p_value
      |    FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, p.p_event_id AS purchase_id,
      |  p.p_value AS purchase_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.p_ts
      |ORDER BY c.event_id""".stripMargin

  /** q126 — the `ext.Skew.saltedJoin` OPERATOR under the oracle gate:
    * lineitem ⋈ part on partkey with the big side salted across 8
    * sub-partitions (the hot-key mitigation a 100 TB CDC join needs
    * when AQE's skew split can't help a single pathological key).
    * The oracle is the PLAIN join — the gate proves salting is
    * result-invariant, which is the entire point of the rewrite. */
  def q126(s: SparkSession, dir: String): DataFrame = {
    val big = Tables(s, dir, "lineitem")
      .select(col("l_partkey").as("partkey"), col("l_quantity"))
    val small = Tables(s, dir, "part")
      .select(col("p_partkey").as("partkey"),
        substring(col("p_type"), 1, 6).as("type_prefix"))
    graft.ext.Skew.saltedJoin(big, small, "partkey", salts = 8)
      .groupBy(col("type_prefix"))
      .agg(count(lit(1)).as("n_items"),
        sumD("l_quantity").as("sum_qty"))
      .orderBy(col("type_prefix"))
  }

  val q126Sql: String =
    s"""SELECT substring(p_type, 1, 6) AS type_prefix,
       |  COUNT(*) AS n_items, ${oSumD("l_quantity")} AS sum_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY 1 ORDER BY type_prefix""".stripMargin

  /** q142 — `ext.Skew.saltedJoinSkewAware` under the oracle gate:
    * q126's join with the big side's keys COLLAPSED onto a planted
    * hot value (partkey % 50 = 0 → key 0 — ~2% of rows on one key,
    * the pathological-default shape) so detection genuinely fires,
    * while the other 49/50 of keys stay cold and take the plain-join
    * path. Oracle = the plain join over the same collapsed keys —
    * the gate proves hot-only salting is result-invariant across
    * BOTH paths and their union. */
  def q142(s: SparkSession, dir: String): DataFrame = {
    val hotKey = when(col("l_partkey") % 50 === 0, lit(0L))
      .otherwise(col("l_partkey"))
    val big = Tables(s, dir, "lineitem")
      .select(hotKey.as("partkey"), col("l_quantity"))
    val small = Tables(s, dir, "part")
      .select(col("p_partkey").as("partkey"),
        substring(col("p_type"), 1, 6).as("type_prefix"))
    graft.ext.Skew.saltedJoinSkewAware(big, small, "partkey",
        salts = 8, hotShare = 0.01)
      .groupBy(col("type_prefix"))
      .agg(count(lit(1)).as("n_items"),
        sumD("l_quantity").as("sum_qty"))
      .orderBy(col("type_prefix"))
  }

  val q142Sql: String =
    s"""WITH b AS (SELECT CASE WHEN l_partkey % 50 = 0 THEN 0
       |    ELSE l_partkey END AS partkey, l_quantity FROM lineitem)
       |SELECT substring(p_type, 1, 6) AS type_prefix,
       |  COUNT(*) AS n_items, ${oSumD("l_quantity")} AS sum_qty
       |FROM b JOIN part ON partkey = p_partkey
       |GROUP BY 1 ORDER BY type_prefix""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q47_asof_join", q47, Some(q47Sql)),
    QueryDef("q48_range_band_join", q48, Some(q48Sql)),
    QueryDef("q49_percentiles", q49, Some(q49Sql)),
    QueryDef("q50_edit_distance", q50, Some(q50Sql)),
    QueryDef("q125_asof_operator", q125, Some(q125Sql)),
    QueryDef("q126_salted_join", q126, Some(q126Sql)),
    QueryDef("q142_salted_join_skew_aware", q142, Some(q142Sql)))
}
