package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph centrality over an edge list — the curation use
  * is importance/diversity scoring over a SIMILARITY graph (PageRank
  * over the k-NN graph ranks documents by how central they are to the
  * corpus's semantic neighborhood structure; the reference corpus
  * pipelines' "pick representative members" move, complementing the
  * connected-components dedup in [[Dedup]] which only answers
  * same/different).
  *
  * Everything is EXACT fixed-point integer arithmetic (truncating
  * division, damping as a rational dampNum/dampDen), so ranks are
  * bit-identical across engines and an unrolled-iteration SQL oracle
  * can hash-match them — same policy as the rest of the library: no
  * floating-point accumulation order dependence anywhere.
  */
object Graph {

  /** Deterministic fixed-point PageRank over a DIRECTED edge list.
    *
    * Per iteration, with `r0 = scale div n` the uniform start and
    * `tele = ((dampDen−dampNum)·r0) div dampDen` the teleport mass:
    *
    * {{{ r'(v) = tele + Σ_{(u,v) ∈ E} (dampNum·r(u)) div (dampDen·deg(u)) }}}
    *
    * All quantities are BIGINT; every division truncates toward zero
    * (all values non-negative), so the result is a pure function of
    * the edge list — no RNG, no convergence test, a FIXED number of
    * iterations (`iters`), matching what an unrolled oracle can
    * replay. Total mass drifts slightly below `scale` from
    * truncation; rankings are what matter and they are exact.
    *
    * Contract: every node referenced as `dst` should also appear as a
    * `src` (true for k-NN graphs, where out-degree is exactly k) —
    * dangling nodes keep receiving teleport+in-mass but their own
    * mass leaks, the standard simplification.
    *
    * Scale shape: per iteration one hash join of the edge list with
    * the rank frame keyed on `src` and one aggregation keyed on `dst`
    * — the two keyed shuffles of textbook distributed PageRank; the
    * rank frame is one row per node and is never collected. The only
    * driver-side value is n (one count over node ids). The edge list
    * (with degrees) and each iteration's rank frame are
    * `localCheckpoint`ed — without the truncation the rank lineage
    * NESTS and the edge subtree is recomputed ~2^iters times (the
    * same hazard [[Dedup]]'s connected-components loop pins per
    * round).
    *
    * Output: (id, rank_fp) — rank scaled by `scale`.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame =
    rank(edges, srcCol, dstCol, iters, dampNum, dampDen, scale, None,
      None)

  /** WEIGHTED PageRank — contribution ∝ w(u,v)/Σw(u,·) instead of
    * 1/deg(u): on a similarity graph, rank flows preferentially along
    * STRONG edges (a node's mass splits by how similar each neighbor
    * is, not uniformly across its k links) — the natural centrality
    * for k-NN graphs whose edges carry the exact fixed-point cosine
    * ([[Similarity.knnJoinBrute]]'s `score_fp`).
    *
    * `weightCol` must be a positive BIGINT (fails loudly otherwise —
    * a zero total out-weight would divide by zero). The per-edge term
    * `(dampNum·r(u)·w) div (dampDen·wsum(u))` runs in DECIMAL(38,0)
    * (r·w alone reaches ~10²⁴ at the default scale with fixed-point
    * similarity weights — past BIGINT) and truncates back to BIGINT;
    * an oracle replays it with any exact 128-bit integer division
    * (DuckDB: HUGEINT). Same contract, iteration count and scale
    * shape as [[pageRank]]; uniform weights reproduce it exactly. */
  def pageRankWeighted(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, iters: Int = 3,
      dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame =
    rank(edges, srcCol, dstCol, iters, dampNum, dampDen, scale, None,
      Some(weightCol))

  /** PERSONALIZED PageRank — the seed-expansion curation op (given a
    * small TRUSTED set — hand-vetted docs, a quality whitelist — rank
    * the whole corpus by graph proximity to it; the OpenWebText /
    * quality-seeding move): identical recurrence, but the start mass
    * and the teleport both concentrate on the seed nodes
    * (`r0(v) = scale div |S|` for seeds, else 0; teleport likewise),
    * so rank flows outward from the trusted set with damping.
    * `seeds` is a one-column frame of node ids (broadcast — seed sets
    * are small by definition); seeds absent from the graph contribute
    * nothing. Same exact-integer contract and scale shape as
    * [[pageRank]]. */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, iters: Int = 3,
      dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame =
    rank(edges, srcCol, dstCol, iters, dampNum, dampDen, scale,
      Some(seeds), None)

  private def rank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampNum: Long, dampDen: Long, scale: Long,
      seeds: Option[DataFrame], weight: Option[String]): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen: $dampNum/$dampDen")
    // materialize the edge list ONCE: nodes, degrees, and every
    // iteration all derive from it — without this pin the (possibly
    // expensive) edge construction re-runs per derived job
    val wCol = weight.map { wc =>
      val w = col(wc).cast("long")
      when(w.isNull || w <= 0, raise_error(concat(
          lit("pageRankWeighted: weights must be positive; got "),
          coalesce(w.cast("string"), lit("null"))))
        .cast("long")).otherwise(w).as("w")
    }
    val e = edges.select(Seq(
        col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")) ++ wCol.toSeq: _*)
      .localCheckpoint()
    val allNodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    // `is_seed` pinned on the node frame once (broadcast: seed sets
    // are small); uniform mode marks every node
    val nodes = (seeds match {
      case Some(s) => allNodes.join(
          broadcast(s.select(s.columns.head).toDF("id").distinct()
            .select(col("id").cast("long").as("id"),
              lit(true).as("is_seed"))),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("is_seed"), lit(false))
          .as("is_seed"))
      case None => allNodes.select(col("id"), lit(true).as("is_seed"))
    }).localCheckpoint()
    val n = nodes.filter(col("is_seed")).count() // mass denominator
    require(n > 0, if (seeds.isDefined) "no seed appears in the graph"
      else "empty graph")
    val r0 = scale / n
    val tele = ((dampDen - dampNum) * r0) / dampDen
    val ed = (weight match {
      // weighted: each edge carries its share denominator Σw(u,·);
      // unweighted: the out-degree
      case Some(_) => e.join(
        e.groupBy("src").agg(sum(col("w")).as("wsum")), "src")
      case None => e.join(
        e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
    }).localCheckpoint()
    // the per-edge contribution: weighted runs in DECIMAL(38,0)
    // (r·w ≈ 10²⁴ at default scale) and truncates back to BIGINT
    val contribExpr = weight match {
      case Some(_) =>
        s"""CAST((CAST($dampNum AS DECIMAL(38,0)) * r * w)
           | div (CAST($dampDen AS DECIMAL(38,0)) * wsum)
           | AS BIGINT)""".stripMargin.replace("\n", "")
      case None => s"($dampNum * r) div ($dampDen * deg)"
    }
    def teleOf(c: Column): Column = when(c, lit(tele)).otherwise(lit(0L))
    var ranks = nodes.select(col("id"),
      when(col("is_seed"), lit(r0)).otherwise(lit(0L)).as("r"))
    for (_ <- 0 until iters) {
      // fresh column names each stage: nodes/ranks share lineage, so
      // df("col") references would be ambiguous after a few rounds
      val contrib = ed
        .join(ranks.select(col("id").as("_rid"), col("r")),
          col("src") === col("_rid"))
        .select(col("dst").as("_cid"), expr(contribExpr).as("c"))
        .groupBy("_cid").agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contrib, col("id") === col("_cid"), "left")
        .select(col("id"),
          (teleOf(col("is_seed")) + coalesce(col("cin"), lit(0L)))
            .as("r"))
        .localCheckpoint()
    }
    ranks.select(col("id"), col("r").as("rank_fp"))
  }
}
