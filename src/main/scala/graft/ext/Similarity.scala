package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search library over an `Array[Float]` embedding column —
  * the reusable faces of the oracle-checked q36–q39: exact cosine
  * top-k, near-dup pairs, hyperplane-LSH bucketing and IVF
  * assignment/search. Uses the codegen'd `fixed_dot` expression when
  * GraftExtensions is active, else the built-in composition.
  *
  * Scale: top-k is a broadcast + single scan (TakeOrdered); LSH/IVF
  * assignment are scan-only and their bucket/cluster ids are meant to
  * become write-time partition columns, so the 100 TB search path is
  * partition pruning + one bucket scan.
  */
object Similarity {

  private def dotExpr(df: DataFrame, a: String, b: String): Column =
    if (df.sparkSession.catalog.functionExists("fixed_dot"))
      expr(s"fixed_dot($a, $b)")
    else expr(
      s"""aggregate(zip_with($a, $b, (x, y) ->
         |  CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12)
         |    AS BIGINT)), 0L, (acc, v) -> acc + v)""".stripMargin)

  /** Cosine of the embedding column against one broadcast query row
    * (`queryDf` must have a single row with column `qe`). */
  def withCosine(df: DataFrame, queryDf: DataFrame,
      embCol: String = "embedding"): DataFrame =
    df.crossJoin(broadcast(queryDf))
      .withColumn("cos_sim", dotExpr(df, embCol, "qe") / lit(1e12))

  /** Exact top-k by cosine against the embedding of `queryId`. */
  def cosineTopK(df: DataFrame, idCol: String, queryId: Long, k: Int,
      embCol: String = "embedding"): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(embCol).as("qe"))
    withCosine(df.filter(col(idCol) =!= queryId), q, embCol)
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .drop("qe")
  }

  /** All pairs with cosine ≥ threshold (exact; parallelized pair join).
    * At scale run [[lshBucket]] first and join within buckets. */
  def nearDupPairs(df: DataFrame, idCol: String, threshold: Double,
      embCol: String = "embedding"): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    val a = df.select(col(idCol).as("a_id"), col(embCol).as("ea"))
      .repartition(n)
    val b = df.select(col(idCol).as("b_id"), col(embCol).as("eb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos_sim", dotExpr(df, "ea", "eb") / lit(1e12))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
  }

  /** Deterministic hyperplane-LSH bucket id (2^planes buckets). */
  def lshBucket(embCol: String = "embedding", planes: Int = 4): Column =
    expr(
      s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, j) -> acc +
         |  IF(aggregate(zip_with($embCol,
         |       sequence(0, size($embCol) - 1),
         |       (x, i) -> CAST(ROUND(CAST(x AS DOUBLE) * 1e7) AS BIGINT)
         |         * (pmod(i * 31 + j * 17, 13) - 6)),
         |       0L, (a2, v) -> a2 + v) > 0,
         |     shiftleft(1L, CAST(j AS INT)), 0L))""".stripMargin)

  /** Assign every row to its max-dot centroid (IVF coarse quantizer).
    * `centroids` must have (cid, ce) columns; it is broadcast. */
  def ivfAssign(df: DataFrame, centroids: DataFrame,
      embCol: String = "embedding"): DataFrame = {
    val byDot = Window.partitionBy(col("__rid"))
      .orderBy(col("cdot").desc, col("cid"))
    df.withColumn("__rid", monotonically_increasing_id())
      .crossJoin(broadcast(centroids))
      .withColumn("cdot", dotExpr(df, embCol, "ce"))
      .withColumn("__rn", row_number().over(byDot))
      .filter(col("__rn") === 1)
      .drop("__rid", "__rn", "cdot", "ce")
  }
}
