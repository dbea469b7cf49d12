package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDef._

/** Frame-spec windows and order-sensitive aggregation surfaces
  * (SURVEY.md §2.7 W6 + §2.6 extensions). Doubles inside moving
  * frames go through the fixed-point trick: incremental (Spark) vs
  * segment-tree (DuckDB) frame evaluation sums doubles in different
  * orders, but integer sums are order-free. collect_list is
  * explicitly sorted before concatenation — its native order is
  * partition-arrival nondeterministic. */
object WindowQ {

  /** q51 — moving window aggregate: 3-event moving sum/avg of value
    * per user, ordered by event time. */
  def q51(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("fixed", expr("CAST(ROUND(value * 1e4) AS BIGINT)"))
      .withColumn("mov_sum", (sum(col("fixed")).over(w) / 1e4))
      .withColumn("mov_n", count(lit(1)).over(w))
      .withColumn("mov_avg", col("mov_sum") / col("mov_n"))
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("mov_sum"),
        col("mov_n"), col("mov_avg"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q51Sql: String =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(ROUND(value * 1e4) AS BIGINT) AS fixed
      |  FROM events)
      |SELECT user_id, event_id,
      |  CAST(SUM(fixed) OVER w AS DOUBLE) / 1e4 AS mov_sum,
      |  COUNT(*) OVER w AS mov_n,
      |  (CAST(SUM(fixed) OVER w AS DOUBLE) / 1e4) / (COUNT(*) OVER w)
      |    AS mov_avg
      |FROM e WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** q52 — ordered string aggregation: sorted distinct order statuses
    * per priority (listagg/string_agg surface). */
  def q52(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
          .as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy(col("o_orderpriority"))

  val q52Sql: String =
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
      |    AS statuses,
      |  COUNT(DISTINCT o_orderstatus) AS n_statuses
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q53 — multiset difference (EXCEPT ALL): duplicate-preserving set
    * semantics beyond q08's anti join. */
  def q53(s: SparkSession, dir: String): DataFrame = {
    val all = Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderstatus"))
    val finished = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"), col("o_orderstatus"))
    all.exceptAll(finished)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderstatus"))
  }

  val q53Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_rows FROM (
      |  SELECT o_custkey, o_orderstatus FROM orders
      |  EXCEPT ALL
      |  SELECT o_custkey, o_orderstatus FROM orders
      |  WHERE o_orderstatus = 'F') t
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q54 — generator/UDTF surface: positional explode of the embedding
    * vector (posexplode ≡ unnest over the index range in DuckDB). */
  def q54(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"),
        col("col").cast("double").as("val"))
      .orderBy(col("vec_id"), col("pos"))

  val q54Sql: String =
    """SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
      |FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
      |WHERE vec_id < 3 ORDER BY vec_id, pos""".stripMargin

  /** q55 — approximate distinct via HLL sketch (Spark 4 datasketches
    * surface) + approx_count_distinct, made fully oracle-checkable:
    * raw HLL estimates differ between engines, so the query emits the
    * EXACT distinct counts (hash-compared against DuckDB) alongside a
    * relative-error BOUND on each estimator folded into a boolean the
    * oracle states as TRUE — a drifting/broken sketch flips the flag
    * and fails the hash. The asserted bound is 15% ≈ 3σ of the
    * estimators' default rsd (0.05 is a ONE-sigma figure, so a 5%
    * gate would flag legitimate estimator variance as wrongness on
    * any new corpus or scale factor — the gate must only catch a
    * BROKEN sketch, not an unlucky one). At 100 TB users run ONLY the
    * sketch columns (that is their point — one pass, bounded memory);
    * the exact columns here exist to gate the estimators against the
    * oracle. */
  def q55(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))")
          .as("hll_parts"),
        approx_count_distinct(col("l_suppkey")).as("acd_supps"))
      .select(col("l_returnflag"),
        col("exact_parts"), col("exact_supps"),
        (abs(col("hll_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.15).as("hll_within_3sigma"),
        (abs(col("acd_supps") - col("exact_supps")) <=
          col("exact_supps") * 0.15).as("acd_within_3sigma"))
      .orderBy(col("l_returnflag"))

  val q55Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(DISTINCT l_suppkey) AS exact_supps,
      |  TRUE AS hll_within_3sigma,
      |  TRUE AS acd_within_3sigma
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q51_moving_window", q51, Some(q51Sql)),
    QueryDef("q52_string_agg", q52, Some(q52Sql)),
    QueryDef("q53_except_all", q53, Some(q53Sql)),
    QueryDef("q54_posexplode", q54, Some(q54Sql)),
    QueryDef("q55_approx_distinct", q55, Some(q55Sql)))
}
