package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim L2-normalized
  * `Array[Float]`): brute-force cosine top-k as the correctness
  * baseline, random-hyperplane LSH bucketing and IVF (centroid
  * partitioning) as the 100 TB scale paths.
  *
  * Dot products are computed in fixed-point (per-element double product
  * rounded at 1e-12, summed as BIGINT) so Spark and the DuckDB oracle
  * produce bit-identical results regardless of summation order; since
  * the vectors are unit-norm the dot product IS the cosine.
  *
  * Scale design: brute-force is one broadcast of the query vector and a
  * single codegen'd scan (no shuffle); LSH/IVF prune the candidate set
  * by bucketing so the 100 TB case only scans one bucket/cluster —
  * the bucket id is computable at write time and becomes a partition
  * column for partition pruning.
  */
object EmbeddingQ {

  /** Fixed-point dot product of two float-array columns (Spark side):
    * uses the codegen'd native expression when GraftExtensions is
    * active, else the semantically-identical built-in composition. */
  private def dotE(a: String, b: String) =
    s"""aggregate(zip_with($a, $b, (x, y) ->
       |  CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)),
       |  0L, (acc, v) -> acc + v)""".stripMargin

  private def dot(s: SparkSession, a: String, b: String): String =
    if (s.catalog.functionExists("fixed_dot")) s"fixed_dot($a, $b)"
    else dotE(a, b)

  /** Same in DuckDB (1-based indexing). */
  private def dotD(a: String, b: String) =
    s"""CAST(list_sum(list_transform(range(1, len($a) + 1), i ->
       |  CAST(ROUND(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) * 1e12)
       |    AS BIGINT))) AS BIGINT)""".stripMargin

  /** q36 — brute-force cosine top-k (ANN correctness baseline): query
    * vector broadcast to every partition, one narrow scan, global
    * TakeOrdered(10). */
  def q36(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (expr(dot(s, "embedding", "qe")) / lit(1e12)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  val q36Sql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id,
       |  CAST(${dotD("embedding", "qe")} AS DOUBLE) / 1e12 AS cos_sim
       |FROM embeddings, q WHERE vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  /** q37 — embedding-cosine near-dup pairs (dedup by similarity): all
    * pairs with cos ≥ 0.45. Brute self-join here; at scale the LSH
    * bucket (q38) bounds the pair space first. */
  def q37(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    // the table is one small parquet file → 1 input partition, and the
    // broadcast nested-loop pair join parallelizes over LEFT partitions
    // — spread the left side across the cores first
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .repartition(s.sparkContext.defaultParallelism)
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (expr(dot(s, "ea", "eb")) / lit(1e12)).as("cos_sim"))
      .filter(col("cos_sim") >= 0.45)
      .orderBy(col("a_id"), col("b_id"))
  }

  val q37Sql: String =
    s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  CAST(${dotD("a.embedding", "b.embedding")} AS DOUBLE) / 1e12
       |    AS cos_sim
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE CAST(${dotD("a.embedding", "b.embedding")} AS DOUBLE) / 1e12
       |  >= 0.45
       |ORDER BY a_id, b_id""".stripMargin

  /** Random-hyperplane LSH bucket (4 deterministic integer hyperplanes
    * h(i,j) = ((i*31 + j*17) mod 13) - 6 over 0-based dim i): 4 sign
    * bits → 16 buckets. Fully integer ⇒ engine-portable. */
  private val bucketE =
    s"""aggregate(sequence(0, 3), 0L, (acc, j) -> acc +
       |  IF(aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
       |       (x, i) -> CAST(ROUND(CAST(x AS DOUBLE) * 1e7) AS BIGINT)
       |         * (pmod(i * 31 + j * 17, 13) - 6)),
       |       0L, (a2, v) -> a2 + v) > 0,
       |     shiftleft(1L, CAST(j AS INT)), 0L))""".stripMargin
  private val bucketD =
    s"""CAST(list_sum(list_transform(range(0, 4), j ->
       |  CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
       |    i -> CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e7) AS BIGINT)
       |      * ((((i - 1) * 31 + j * 17) % 13) - 6))) > 0
       |  THEN 1 << j ELSE 0 END)) AS BIGINT)""".stripMargin

  /** q38 — LSH-bucketed ANN: only the query's bucket is scanned, then
    * exact cosine re-ranks the candidates (top-5). */
  def q38(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
      .withColumn("bucket", expr(bucketE))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
    emb.crossJoin(broadcast(q))
      .filter(col("bucket") === col("qbucket") && col("vec_id") =!= 0)
      .select(col("vec_id"), col("bucket"),
        (expr(dot(s, "embedding", "qe")) / lit(1e12)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  val q38Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding, $bucketD AS bucket
       |  FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qbucket FROM e
       |  WHERE vec_id = 0)
       |SELECT vec_id, bucket,
       |  CAST(${dotD("embedding", "qe")} AS DOUBLE) / 1e12 AS cos_sim
       |FROM e, q WHERE bucket = qbucket AND vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  /** q39 — IVF search: vectors of id 0..7 act as centroids; every
    * vector is assigned to its max-dot centroid (one broadcast join +
    * window argmax); the query probes only its own cluster. At scale
    * the assignment is a write-time partition column. */
  def q39(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val cent = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val byDot = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdot").desc, col("cid"))
    val assigned = emb.crossJoin(broadcast(cent))
      .withColumn("cdot", expr(dot(s, "embedding", "ce")))
      .withColumn("rn", row_number().over(byDot))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
    val q = assigned.filter(col("vec_id") === 42)
      .select(col("embedding").as("qe"), col("cid").as("qcid"))
    assigned.crossJoin(broadcast(q))
      .filter(col("cid") === col("qcid") && col("vec_id") =!= 42)
      .select(col("vec_id"), col("cid"),
        (expr(dot(s, "embedding", "qe")) / lit(1e12)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  val q39Sql: String =
    s"""WITH cent AS (SELECT vec_id AS cid, embedding AS ce
       |  FROM embeddings WHERE vec_id < 8),
       |scored AS (SELECT e.vec_id, e.embedding, c.cid,
       |    ${dotD("e.embedding", "c.ce")} AS cdot,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dotD("e.embedding", "c.ce")} DESC, c.cid) AS rn
       |  FROM embeddings e CROSS JOIN cent c),
       |assigned AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
       |q AS (SELECT embedding AS qe, cid AS qcid FROM assigned
       |  WHERE vec_id = 42)
       |SELECT vec_id, cid,
       |  CAST(${dotD("embedding", "qe")} AS DOUBLE) / 1e12 AS cos_sim
       |FROM assigned, q WHERE cid = qcid AND vec_id <> 42
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q36_knn_brute", q36, Some(q36Sql)),
    QueryDef("q37_cosine_pairs", q37, Some(q37Sql)),
    QueryDef("q38_ann_lsh", q38, Some(q38Sql)),
    QueryDef("q39_ivf_search", q39, Some(q39Sql)))
}
