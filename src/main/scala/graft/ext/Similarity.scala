package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity-search library over an `Array[Float]` embedding column —
  * the reusable faces of the oracle-checked q36–q39: exact cosine
  * top-k, near-dup pairs, hyperplane-LSH bucketing and IVF
  * assignment/search. Uses the codegen'd `fixed_dot` / `lsh_bucket`
  * expressions when GraftExtensions is active, else the built-in
  * compositions.
  *
  * Scale: top-k is a broadcast + single scan (TakeOrdered); the
  * default near-dup pair path is LSH-band-blocked (candidates share at
  * least one band bucket — never the all-pairs cross product); LSH/IVF
  * assignment are scan-only and their bucket/cluster ids are meant to
  * become write-time partition columns ([[AnnIndex]]), so the 100 TB
  * search path is partition pruning + one bucket scan.
  */
object Similarity {

  /** Fixed-point dot SQL over two array-typed SQL fragments (column
    * names or literals): native codegen'd expression when
    * GraftExtensions is active, else the bit-identical composition. */
  private[graft] def dotSql(spark: org.apache.spark.sql.SparkSession,
      a: String, b: String): String =
    if (spark.catalog.functionExists("fixed_dot")) s"fixed_dot($a, $b)"
    else
      s"""aggregate(zip_with($a, $b, (x, y) ->
         |  CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12)
         |    AS BIGINT)), 0L, (acc, v) -> acc + v)""".stripMargin

  private def dotExpr(df: DataFrame, a: String, b: String): Column =
    expr(dotSql(df.sparkSession, a, b))

  /** SQL literal for a float array. String-cast per element: Java's
    * shortest-repr Float.toString round-trips exactly through
    * Float.parseFloat, so the literal reconstructs the identical
    * floats on the executor. */
  private[graft] def litFloatArraySql(a: Array[Float]): String =
    a.map(f => s"CAST('$f' AS FLOAT)").mkString("array(", ", ", ")")

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

  // ----------------------------------------------------------------
  // Batched k-NN retrieval join — the RAG / eval-set / diversity-
  // sampling shape: MANY query vectors, each finding its top-k corpus
  // neighbors (q36 is the single-query special case).

  /** Exact brute-force k-NN join: the (bounded) query set broadcasts
    * to every corpus partition, candidates score with the fixed-point
    * dot, and `topk_by` reduces them with a k-BOUNDED partial
    * aggregate — ≤ k entries per partition per query shuffle, never
    * the |corpus| rows per query a window-rank plan would move. One
    * corpus scan, one bounded shuffle; cost O(|Q|·|C|) dots, so this
    * is the correctness baseline and the eval-set shape (|Q| small),
    * not the 100 TB-to-100 TB path — that is [[knnJoinLsh]].
    * Output: (q_id, c_id, rnk 1..k, cos_sim), deterministic (ties by
    * c_id ASC). Falls back to a window rank without GraftExtensions. */
  def knnJoinBrute(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, k: Int,
      embCol: String = "embedding", excludeSelf: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).cast("long").as("q_id"),
      col(embCol).as("qe")))
    val c = corpus.select(col(cIdCol).cast("long").as("c_id"),
      col(embCol).as("ce"))
    val pairs = c.crossJoin(q)
    // self-pair exclusion (queries ⊆ corpus, e.g. a k-NN graph): the
    // filter runs BEFORE the k-bounded state, so rank 1..k is over
    // genuine neighbors, not the trivial self-match
    val kept = if (excludeSelf) pairs.filter(col("c_id") =!= col("q_id"))
      else pairs
    topkReduce(kept.select(col("q_id"), col("c_id"),
      dotExpr(corpus, "ce", "qe").as("s")), k)
  }

  /** Hard-negative mining — the contrastive-training companion of
    * [[knnJoinBrute]] (DPR/Contriever pipelines): for every query,
    * the k MOST similar corpus items with a DIFFERENT label — near
    * the decision boundary by construction. Same broadcast-queries ×
    * corpus-scan shape and k-bounded `topk_by` reduction as the rest
    * of the retrieval-join family; the label predicate filters pairs
    * BEFORE the top-k state, so per-query memory stays k rows. For
    * corpora too big for a full scan per batch, compose the same
    * predicate with [[knnJoinLsh]]/[[knnJoinIvf]] blocking. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, labelCol: String, k: Int,
      embCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).cast("long").as("q_id"),
      col(labelCol).as("q_lab"), col(embCol).as("qe")))
    val c = corpus.select(col(cIdCol).cast("long").as("c_id"),
      col(labelCol).as("c_lab"), col(embCol).as("ce"))
    topkReduce(c.crossJoin(q)
      .filter(col("c_lab") =!= col("q_lab"))
      .select(col("q_id"), col("c_id"),
        dotExpr(corpus, "ce", "qe").as("s")), k)
  }

  /** k-NN label propagation — the weak-labeling / label-transfer op
    * (transfer a small hand-labeled set's labels onto an unlabeled
    * corpus, e.g. quality tiers or topic tags before a curation cut):
    * every query vector takes the MAJORITY label among its k nearest
    * labeled neighbors by exact fixed-point cosine. Fully
    * deterministic: neighbor ties resolve by id ([[knnJoinBrute]]'s
    * contract), vote ties by (votes DESC, best neighbor rank ASC,
    * label ASC). Neighbor search is the broadcast-queries ×
    * corpus-scan shape with the k-bounded `topk_by` reduction; the
    * label lookup re-joins only the |Q|·k winner rows (broadcast) —
    * the corpus is scanned once and never shuffled. For 100 TB
    * corpora swap the neighbor stage for [[knnJoinLsh]] blocking
    * (same output contract). Output: (q_id, pred_label, votes,
    * best_rnk). */
  def labelPropagate(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, labelCol: String, k: Int,
      embCol: String = "embedding"): DataFrame =
    voteResolve(
      knnJoinBrute(queries, corpus, qIdCol, cIdCol, k, embCol),
      corpus, cIdCol, labelCol)

  /** LSH-BLOCKED label propagation — [[labelPropagate]]'s 100 TB
    * configuration (the [[hardNegativesLsh]] move): neighbors come
    * from the same-bucket equi-join at the auto-derived width, so
    * candidate volume divides by 2^planes; the majority vote and its
    * tie rules are identical. Neighbors are the nearest IN the
    * query's bucket — the [[knnJoinLsh]] recall trade-off. */
  def labelPropagateLsh(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, labelCol: String, k: Int,
      planes: Int = 0, embCol: String = "embedding"): DataFrame =
    voteResolve(
      knnJoinLsh(queries, corpus, qIdCol, cIdCol, k, planes, embCol),
      corpus, cIdCol, labelCol)

  /** Majority-vote resolution shared by the label-propagation paths:
    * the |Q|·k winner rows broadcast into the label lookup (the
    * corpus is never shuffled), then (votes DESC, best rank ASC,
    * label ASC) picks deterministically. */
  private def voteResolve(knn: DataFrame, corpus: DataFrame,
      cIdCol: String, labelCol: String): DataFrame = {
    val lab = corpus.select(col(cIdCol).cast("long").as("c_id"),
      col(labelCol).as("c_lab"))
    val votes = lab.join(broadcast(knn), "c_id")
      .groupBy(col("q_id"), col("c_lab"))
      .agg(count(lit(1)).as("votes"), min(col("rnk")).as("best_rnk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("votes").desc, col("best_rnk").asc, col("c_lab").asc)
    votes.withColumn("_pick", row_number().over(w))
      .filter(col("_pick") === 1)
      .select(col("q_id"), col("c_lab").as("pred_label"),
        col("votes"), col("best_rnk"))
  }

  /** Streaming label transfer — [[labelPropagate]] applied live
    * (auto-tag arriving documents against a curated labeled set
    * before they land): every micro-batch of unlabeled vectors takes
    * the majority label among its k nearest neighbors in the labeled
    * REFERENCE set — a static frame re-read per batch via the thunk,
    * so an offline re-label is picked up live — and the tagged rows
    * append to a graft table exactly-once (batch-id-keyed txn
    * markers). Predictions are a pure function of (vector, reference
    * set), so crash replays land the SAME labels. Per trigger: one
    * reference scan + the k-bounded reduction against the batch
    * only; swap the neighbor stage for [[knnJoinLsh]] via the same
    * contract when the reference set outgrows a full scan per
    * batch. Rows that receive NO prediction (e.g. the reference set
    * is empty that trigger) still land, with null
    * `pred_label`/`votes` — a LEFT join, so no arriving vector is
    * ever silently dropped; downstream filters on `pred_label IS
    * NULL` see exactly what went untagged. */
  def labelStreamToTable(stream: DataFrame, idCol: String,
      labeled: () => DataFrame, cIdCol: String, labelCol: String,
      k: Int, outDir: String, checkpointDir: String,
      embCol: String = "embedding", appId: String = "graft-labelprop")
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val preds = labelPropagate(batch, labeled(), idCol, cIdCol,
          labelCol, k, embCol)
        graft.sink.CdcTable.append(
          batch.join(preds.select(col("q_id").as(idCol),
            col("pred_label"), col("votes")), Seq(idCol), "left"),
          outDir, txn = Some((appId, id)))
        ()
      }
      .start()

  /** PQ-COMPRESSED k-NN join — [[knnJoinBrute]]'s shape over the
    * codes alone (many queries × a compressed corpus): the corpus
    * side encodes to m small ints per row ([[pqEncodeLit]] — one
    * codegen'd projection; the float column is never read past the
    * encode), each broadcast query carries its (m × codes) exact
    * fixed-point ADC lookup table as a LITERAL-built array column
    * ([[pqLutLit]]), and the pair score is m `element_at` lookups
    * summed ([[pqAdcCols]]) — integer arithmetic end to end, so the
    * approximate ranking is bit-deterministic and oracle-replayable.
    * Same k-bounded `topk_by` reduction as the rest of the family.
    * At 100 TB this is the batched memory story: the scan reads
    * ~m bytes per corpus row for ALL queries at once, not d floats
    * per query. Compose with IVF blocking
    * ([[graft.ext.AnnIndex.writeIvfPq]]) when a full compressed scan
    * per batch is still too much. */
  def knnJoinPq(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, k: Int,
      books: IndexedSeq[IndexedSeq[Array[Float]]],
      embCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val q0 = queries.select(col(qIdCol).cast("long").as("q_id"),
      col(embCol).as("qe"))
    val q = broadcast(q0
      .withColumn("luts", pqLutLit(spark, "qe", books)).drop("qe"))
    // materialize the encoded corpus (m longs + id per row — this IS
    // the PQ index; [[graft.ext.AnnIndex.writeIvfPq]] is its
    // persistent form). Structural, not just a cache: the encode's
    // generated code is huge (m·codes inlined dot projections), and
    // fused into the same whole-stage-codegen method as the join's
    // inner pair loop it pushes that method past the JIT size limit —
    // the |Q|·|C| loop then runs bytecode-INTERPRETED (measured 49 s
    // vs 1 s for a 481k-pair join at sf0.1). The stage cut keeps the
    // hot loop in its own small, JIT-compiled method.
    val c = corpus.select(col(cIdCol).cast("long").as("c_id"),
      pqEncodeLit(spark, embCol, books).as("codes"))
      .localCheckpoint()
    topkReduce(c.crossJoin(q).select(col("q_id"), col("c_id"),
      pqAdcCols("codes", "luts", books.length).as("s")), k)
      .withColumnRenamed("cos_sim", "adc_sim")
  }

  /** LSH-blocked k-NN join — the scale path: both sides bucket at
    * `planes` hyperplanes (auto-derived from |corpus| when 0, same
    * `clamp(ceil(log2(n/200)), 4, 20)` rule as [[nearDupPairs]]) and
    * only same-bucket pairs are candidates, an equi-join keyed on the
    * bucket — candidate volume per query drops by ~2^planes and the
    * join co-locates by bucket instead of crossing |Q|×|C|. Recall is
    * the banded arithmetic's single-band case ([[bandedRecall]]):
    * near-identical vectors (cos ≥ 0.99) share a 4-plane bucket with
    * ≥ 97% probability; a query may return fewer than k rows when its
    * bucket is sparse — the documented trade. Top-k reduction is the
    * same k-bounded `topk_by` aggregate as [[knnJoinBrute]]. */
  def knnJoinLsh(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, k: Int, planes: Int = 0,
      embCol: String = "embedding", excludeSelf: Boolean = false)
  : DataFrame = {
    val p = if (planes > 0) planes else autoPlanes(corpus.count())
    val q0 = queries.select(col(qIdCol).cast("long").as("q_id"),
      col(embCol).as("qe"))
    val q = broadcast(q0.withColumn("qb", bucketFor(q0, "qe", p, 0)))
    val c0 = corpus.select(col(cIdCol).cast("long").as("c_id"),
      col(embCol).as("ce"))
    val c = c0.withColumn("cb", bucketFor(c0, "ce", p, 0))
    val cond =
      if (excludeSelf) col("cb") === col("qb") && col("c_id") =!= col("q_id")
      else col("cb") === col("qb")
    topkReduce(c.join(q, cond)
      .select(col("q_id"), col("c_id"),
        dotExpr(corpus, "ce", "qe").as("s")), k)
  }

  /** LSH-blocked [[hardNegatives]] — the 100 TB configuration: both
    * sides bucket at the auto-derived width and only same-bucket
    * different-label pairs are candidates (an equi-join keyed on the
    * bucket — candidate volume /2^planes vs the brute scan, which
    * measured 194 s at 100×/500k vectors). Recall trade-off is the
    * [[knnJoinLsh]] one: mined negatives are the hardest IN the
    * query's bucket; widen with multi-probe if the miner must not
    * miss cross-bucket near-boundary items. */
  def hardNegativesLsh(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, labelCol: String, k: Int,
      planes: Int = 0, embCol: String = "embedding"): DataFrame = {
    val p = if (planes > 0) planes else autoPlanes(corpus.count())
    val q0 = queries.select(col(qIdCol).cast("long").as("q_id"),
      col(labelCol).as("q_lab"), col(embCol).as("qe"))
    val q = broadcast(q0.withColumn("qb", bucketFor(q0, "qe", p, 0)))
    val c0 = corpus.select(col(cIdCol).cast("long").as("c_id"),
      col(labelCol).as("c_lab"), col(embCol).as("ce"))
    val c = c0.withColumn("cb", bucketFor(c0, "ce", p, 0))
    topkReduce(c.join(q, col("cb") === col("qb") &&
        col("c_lab") =!= col("q_lab"))
      .select(col("q_id"), col("c_id"),
        dotExpr(corpus, "ce", "qe").as("s")), k)
  }

  /** IVF-blocked k-NN join — cluster-partitioned retrieval: both
    * sides assign to their nearest centroid with the codegen'd
    * literal-inlined argmax ([[ivfAssignLit]] — no centroid fan-out
    * join, no shuffle for the assignment) and only same-cluster pairs
    * are candidates, an equi-join keyed on the cluster id. The IVF
    * analogue of [[knnJoinLsh]]: recall bounded by single-probe IVF
    * (a query near a cluster boundary may miss cross-boundary
    * neighbors — probe more clusters by unioning, or use the LSH
    * variant); at scale the assignment is a write-time partition
    * column and this join prunes to touched clusters
    * ([[AnnIndex.knnJoinBucketed]] shows the pruning machinery). */
  def knnJoinIvf(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, k: Int,
      centroids: IndexedSeq[(Long, Array[Float])],
      embCol: String = "embedding", nprobe: Int = 1): DataFrame = {
    val s = corpus.sparkSession
    val q0 = queries.select(col(qIdCol).cast("long").as("q_id"),
      col(embCol).as("qe"))
    // nprobe > 1: each query probes its n nearest clusters (FAISS's
    // nprobe) — the bounded broadcast query side grows ×nprobe, the
    // corpus side is untouched
    val q = broadcast(
      if (nprobe == 1)
        q0.withColumn("qc", ivfAssignLit(s, "qe", centroids))
      else
        q0.withColumn("qc",
          explode(ivfAssignTopNLit(s, "qe", centroids, nprobe))))
    val c0 = corpus.select(col(cIdCol).cast("long").as("c_id"),
      col(embCol).as("ce"))
    val c = c0.withColumn("cc", ivfAssignLit(s, "ce", centroids))
    topkReduce(c.join(q, col("cc") === col("qc"))
      .select(col("q_id"), col("c_id"),
        dotExpr(corpus, "ce", "qe").as("s")), k)
  }

  /** (q_id, c_id, s fixed-point) → (q_id, c_id, rnk, cos_sim,
    * score_fp): native k-bounded `topk_by` aggregate + posexplode
    * when GraftExtensions is active, else the equivalent (but
    * full-shuffle) window rank. `score_fp` carries the EXACT
    * fixed-point score (cos_sim is its /1e12 double view) — exact
    * consumers (e.g. similarity-weighted PageRank) must use it, not
    * a round-trip through the double.
    * (`private[graft]`: [[AnnIndex.knnJoinBucketed]] shares it.) */
  private[graft] def topkReduce(scored: DataFrame, k: Int): DataFrame =
    if (scored.sparkSession.catalog.functionExists("topk_by"))
      scored.groupBy("q_id")
        .agg(expr(s"topk_by(s, c_id, $k)").as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("p", "e")))
        .select(col("q_id"), col("e.id").as("c_id"),
          (col("p") + 1).cast("long").as("rnk"),
          (col("e.score") / lit(1e12)).as("cos_sim"),
          col("e.score").as("score_fp"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("s").desc, col("c_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("c_id"), col("rnk"),
          (col("s") / lit(1e12)).as("cos_sim"),
          col("s").as("score_fp"))
    }

  /** Deterministic hyperplane-LSH bucket id over `planes` integer
    * hyperplanes starting at plane family `offset` (2^planes buckets).
    * Codegen'd native expression under GraftExtensions; interpreted
    * HOF composition otherwise (bit-identical results). Bands of
    * independent planes come from the same function:
    * band b of width w = `lshBucket(emb, w, b*w)`. */
  def lshBucket(embCol: String = "embedding", planes: Int = 4,
      offset: Int = 0): Column = {
    val native = org.apache.spark.sql.SparkSession.active
      .catalog.functionExists("lsh_bucket")
    expr(lshBucketSql(embCol, planes, offset, native))
  }

  /** Per-plane SIGNED margins of the bucket arithmetic — the raw
    * fixed-point dot of `vec` with each hyperplane. The bucket is the
    * sign pattern; the |margin| is the plane's confidence, which is
    * what multi-probe perturbation orders by. Driver-side mirror of
    * [[marginsSql]], bit-identical by construction. */
  def planeMargins(vec: Array[Float], planes: Int = 4,
      offset: Int = 0): Array[Long] = {
    val fixed = vec.map(x =>
      graft.functions.FixedDot.roundAway(x.toDouble * 1e7))
    Array.tabulate(planes) { j =>
      var s = 0L
      var i = 0
      while (i < fixed.length) {
        s += fixed(i) * (((i * 31 + (j + offset) * 17) %
          graft.functions.LshBucket.PlaneMod) -
          graft.functions.LshBucket.PlaneMod / 2)
        i += 1
      }
      s
    }
  }

  /** Driver-side mirror of [[lshBucket]] for probe-time literal
    * bucket ids (static partition pruning needs a literal, not a
    * joined column). Bit-identical to the expression by construction. */
  def bucketOf(vec: Array[Float], planes: Int = 4, offset: Int = 0): Long =
    planeMargins(vec, planes, offset).zipWithIndex.foldLeft(0L) {
      case (bucket, (m, j)) =>
        if (m > 0) bucket | (1L << j) else bucket
    }

  /** Multi-probe LSH probe set (Lv et al., "Multi-probe LSH",
    * VLDB 2007 — the single-bit perturbation variant): the query's
    * base bucket first, then `probes − 1` buckets obtained by
    * flipping the LEAST-CONFIDENT planes one at a time, in increasing
    * (|margin|, plane-index) order — a near neighbor that lands on
    * the wrong side of a hyperplane almost always does so on one the
    * query barely cleared, so these are exactly the buckets its
    * misses hide in. Recall rises with `probes` at linear probe cost
    * and ZERO index cost (the index is untouched — this is the
    * read-time recall knob, complementing the write-time band
    * families). Deterministic, so SQL oracles reproduce the set. */
  def multiProbeBuckets(vec: Array[Float], planes: Int = 4,
      offset: Int = 0, probes: Int = 2): Seq[Long] = {
    require(probes >= 1 && probes <= planes + 1,
      s"probes must be in [1, planes+1 = ${planes + 1}]: $probes")
    val ms = planeMargins(vec, planes, offset)
    val base = ms.zipWithIndex.foldLeft(0L) { case (b, (m, j)) =>
      if (m > 0) b | (1L << j) else b
    }
    val flips = ms.zipWithIndex
      .map { case (m, j) => (math.abs(m), j) }
      .sorted.take(probes - 1)
      .map { case (_, j) => base ^ (1L << j) }
    base +: flips.toSeq
  }

  /** The per-plane margin array as a Spark expression (0-based array
    * of `planes` BIGINTs) — [[planeMargins]] for a DISTRIBUTED query
    * side. HOF composition only; the values are bit-identical to the
    * driver mirror (same fixed-point arithmetic). */
  private[graft] def marginsSql(embCol: String, planes: Int,
      offset: Int = 0): String = {
    val m = graft.functions.LshBucket.PlaneMod
    s"""transform(sequence(0, ${planes - 1}), j ->
       |  aggregate(zip_with($embCol, sequence(0, size($embCol) - 1),
       |    (x, i) -> CAST(ROUND(CAST(x AS DOUBLE) * 1e7) AS BIGINT)
       |      * (pmod(i * 31 + (j + $offset) * 17, $m) - ${m / 2})),
       |    0L, (a2, v) -> a2 + v))""".stripMargin
  }

  /** Multi-probe bucket ARRAY as a Spark expression over a staged
    * margin-array column (`msCol`, from [[marginsSql]]): base bucket
    * first, then single-bit flips in increasing (|margin|, plane)
    * order — the distributed face of [[multiProbeBuckets]]. */
  private[graft] def probeSetSql(msCol: String, planes: Int,
      probes: Int): String = {
    val base =
      s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, j) ->
         |  acc + IF($msCol[j] > 0, shiftleft(1L, CAST(j AS INT)), 0L))"""
        .stripMargin
    if (probes == 1) s"array($base)"
    else
      s"""concat(array($base), transform(
         |  slice(array_sort(transform(sequence(0, ${planes - 1}),
         |    j -> struct(abs($msCol[j]) AS a, j AS j))), 1, ${probes - 1}),
         |  f -> CAST($base AS BIGINT) ^ shiftleft(1L, CAST(f.j AS INT))))"""
        .stripMargin
  }

  private[graft] def lshBucketSql(embCol: String, planes: Int,
      offset: Int, native: Boolean): String =
    if (native) s"lsh_bucket($embCol, $planes, $offset)"
    else
      s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, j) -> acc +
         |  IF(aggregate(zip_with($embCol,
         |       sequence(0, size($embCol) - 1),
         |       (x, i) -> CAST(ROUND(CAST(x AS DOUBLE) * 1e7) AS BIGINT)
         |         * (pmod(i * 31 + (j + $offset) * 17,
         |              ${graft.functions.LshBucket.PlaneMod}) -
         |            ${graft.functions.LshBucket.PlaneMod / 2})),
         |       0L, (a2, v) -> a2 + v) > 0,
         |     shiftleft(1L, CAST(j AS INT)), 0L))""".stripMargin

  private def bucketFor(df: DataFrame, embCol: String, planes: Int,
      offset: Int): Column =
    expr(lshBucketSql(embCol, planes, offset,
      native = df.sparkSession.catalog.functionExists("lsh_bucket")))

  /** Near-dup pairs with cosine ≥ threshold — LSH-bucket-blocked (the
    * default, scale-safe path): rows hash into 2^planes buckets and
    * only same-bucket pairs are candidates (one equi-join keyed on the
    * bucket — never the O(n²) cross product), then the exact
    * fixed-point cosine verifies the threshold. With `planes = 0`
    * (default) the width derives from the corpus size — the same
    * `clamp(ceil(log2(n/200)), 4, 20)` rule as [[nearDupIncremental]]
    * — so candidate volume per row stays bounded as the corpus grows.
    * The sizing count is UNFILTERED (metadata-cheap on parquet; a
    * NULL-heavy frame merely overestimates n, widening the probe by
    * at most a plane — never a correctness concern). With
    * `bands` > 1 the candidate test ORs over `bands` independent
    * bucket families (recall 1 − (1 − (1 − θ/π)^planes)^bands at
    * angle θ — trade candidate volume for recall; true near-dups at
    * cos ≥ 0.99 are found with ≥ 97% probability by a single 4-plane
    * bucket), and the auto width additionally clamps so every band's
    * plane family stays distinct. For a guaranteed-exhaustive small
    * input use [[nearDupPairsExact]]. */
  def nearDupPairs(df: DataFrame, idCol: String, threshold: Double,
      embCol: String = "embedding", planes: Int = 0,
      bands: Int = 1): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val hashed = df.filter(col(embCol).isNotNull)
      .select(col(idCol).as("id"), col(embCol).as("e"))
    // the plane family has LshBucket.PlaneMod distinct members; every
    // band offset must stay inside it or bands silently correlate
    val familyCap = (graft.functions.LshBucket.PlaneMod - 1) / bands
    val p =
      if (planes > 0) {
        require(planes * bands <= graft.functions.LshBucket.PlaneMod - 1,
          s"bands * planes must be <= " +
            s"${graft.functions.LshBucket.PlaneMod - 1}, got " +
            s"$bands * $planes")
        planes
      } else math.min(familyCap, autoPlanes(df.count()))
    val verified =
      if (bands == 1) {
        // single bucket family: each pair appears at most once
        val bk = hashed.withColumn("bval", bucketFor(hashed, "e", p, 0))
        val a = bk.select(col("id").as("a_id"), col("e").as("ea"),
          col("bval"))
        val b = bk.select(col("id").as("b_id"), col("e").as("eb"),
          col("bval").as("bbval"))
        a.join(b, col("bval") === col("bbval") && col("a_id") < col("b_id"))
          .withColumn("cos_sim", dotExpr(df, "ea", "eb") / lit(1e12))
          .filter(col("cos_sim") >= threshold)
      } else {
        // OR over bands: explode the band index, join on (band, bval),
        // dedupe AFTER the cheap threshold filter (on scalar columns,
        // not the embedding arrays)
        val banded = hashed
          .withColumn("band", explode(expr(s"sequence(0, ${bands - 1})")))
          .withColumn("bval", bucketsByBand(hashed, "e", bands, p))
        val a = banded.select(col("id").as("a_id"), col("e").as("ea"),
          col("band"), col("bval"))
        val b = banded.select(col("id").as("b_id"), col("e").as("eb"),
          col("band").as("bband"), col("bval").as("bbval"))
        a.join(b, col("band") === col("bband") &&
            col("bval") === col("bbval") && col("a_id") < col("b_id"))
          .withColumn("cos_sim", dotExpr(df, "ea", "eb") / lit(1e12))
          .filter(col("cos_sim") >= threshold)
          .select(col("a_id"), col("b_id"), col("cos_sim"))
          .distinct() // a pair may collide in several bands
      }
    verified.select(col("a_id"), col("b_id"), col("cos_sim"))
  }

  private def bucketsByBand(df: DataFrame, embCol: String, bands: Int,
      rowsPerBand: Int): Column = {
    val native = df.sparkSession.catalog.functionExists("lsh_bucket")
    // band is a column, so fold the per-band expressions into a CASE
    val cases = (0 until bands).map { b =>
      s"WHEN band = $b THEN (${
        lshBucketSql(embCol, rowsPerBand, b * rowsPerBand, native)})"
    }.mkString(" ")
    expr(s"CASE $cases END")
  }

  /** Bit width at which incremental-index bucket values are STORED.
    * Bit j of an LSH bucket is an independent hyperplane sign, so the
    * low p bits of a 20-plane bucket ARE the p-plane bucket — storing
    * 20 bits lets every probe choose its own effective width by
    * masking, and the width can GROW as the index grows without ever
    * rewriting a stored value. */
  private[graft] val StoredPlanes = 20

  /** Plane-family offsets of the stored band columns (`bval`,
    * `bval1`, `bval2`): three DISJOINT 20-plane families inside the
    * mod-61 family ([[graft.functions.LshBucket.PlaneMod]]). Like the
    * width, the BAND COUNT is a probe-time choice: every row stores
    * all three buckets (two extra longs — noise next to the
    * embedding), and a probe ORs over its first `bands` families for
    * recall 1 − (1 − r^p)^bands at per-plane agreement r — the lever
    * that keeps recall up while the auto-width keeps candidate volume
    * down as the index grows. */
  private[graft] val BandOffsets: Seq[Int] = Seq(0, 20, 40)
  private[graft] def bandCol(i: Int): String =
    if (i == 0) "bval" else s"bval$i"

  // ----------------------------------------------------------------
  // Banded-probe recall arithmetic. `planes` and `bands` are free
  // probe-time parameters now that widths auto-derive; the POLICY
  // (what recall is worth what candidate volume) stays caller-owned,
  // but the arithmetic connecting the three shouldn't be — these are
  // the closed forms the probe's behavior follows (RecallSpec
  // cross-checks them against the measured banded probe).
  // ----------------------------------------------------------------

  /** Probability one random hyperplane puts a pair at cosine
    * similarity `cos` on the same side: r = 1 − θ/π (the
    * Goemans–Williamson sign-agreement bound made exact for random
    * projections). */
  def planeAgreement(cos: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, cos))) / math.Pi

  /** Formula recall of a banded probe for a TRUE pair at cosine
    * `cos`: a pair is a candidate when ANY of `bands` disjoint
    * `planes`-bit families agrees on it, so
    * recall = 1 − (1 − r^planes)^bands. Exact verification means
    * precision is 1; this is the only loss term. */
  def bandedRecall(cos: Double, planes: Int, bands: Int): Double = {
    require(planes >= 1, s"planes must be >= 1, got $planes")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val q = math.pow(planeAgreement(cos), planes)
    1.0 - math.pow(1.0 - q, bands)
  }

  /** Smallest band count whose formula recall reaches `targetRecall`
    * for a pair AT `threshold` — the worst true pair; everything more
    * similar does better. A result above [[BandOffsets]].length
    * (currently 3) means the stored families cannot reach the target
    * at that width: probe narrower (smaller `planes`) or lower the
    * target. Returns `Int.MaxValue` when no finite band count reaches
    * it (per-family match probability ~0). */
  def bandsFor(threshold: Double, planes: Int,
      targetRecall: Double): Int = {
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall must be in (0, 1), got $targetRecall")
    val q = math.pow(planeAgreement(threshold), planes)
    if (q >= 1.0) 1
    else if (q <= 0.0) Int.MaxValue
    else {
      val b = math.ceil(math.log1p(-targetRecall) / math.log1p(-q))
      if (b > Int.MaxValue.toDouble) Int.MaxValue else math.max(1, b.toInt)
    }
  }

  /** Default recall target the AUTO band count aims for (pairs AT the
    * threshold — the worst true pair; everything more similar does
    * better). 0.9 is the conventional "miss at most one in ten
    * borderline pairs" dedup bar; callers with a different
    * recall/cost tradeoff pass `bands` explicitly. */
  val DefaultTargetRecall = 0.9

  /** The band count the default (`bands = 0`) probe derives:
    * [[bandsFor]] at the effective width, clamped to the stored
    * families — when even all stored families cannot reach
    * [[DefaultTargetRecall]] at that width (common for loose
    * thresholds at wide auto-widths), the probe uses everything it
    * has rather than failing: recall maxes out at
    * `bandedRecall(threshold, planes, storedBands)`. Mirrored by the
    * q84 oracle in SQL — keep the two in sync. */
  private[graft] def autoBands(threshold: Double, planes: Int,
      storedBands: Int): Int =
    math.max(1, math.min(storedBands,
      bandsFor(threshold, planes, DefaultTargetRecall)))

  /** Auto-width target: effective buckets sized so the expected
    * occupancy is ~this many rows. */
  private[graft] val TargetBucketRows = 200L

  /** Effective probe width for an index of `n` rows:
    * `clamp(ceil(log2(n / 200)), 4, 20)` — the scaladoc formula
    * (planes ≈ log2(n / targetBucketSize)) made executable. The q83
    * oracle mirrors this expression in SQL, so keep the two in sync. */
  private[graft] def autoPlanes(n: Long): Int =
    math.min(StoredPlanes, math.max(4, math.ceil(
      math.log(math.max(n, 1L) / TargetBucketRows.toDouble) /
        math.log(2.0)).toInt))

  /** Ceiling on incremental-batch rows: the batch's distinct bucket
    * keys broadcast, so a corpus-sized "batch" would OOM the driver
    * instead of degrading — fail loudly before that. */
  private[graft] val MaxIncrementalBatchRows = 4L * 1000 * 1000

  /** INCREMENTAL embedding near-dup — the vector analog of
    * [[graft.ext.Dedup.nearIncremental]]: each batch LSH-matches
    * against a bucket index (a graft table) of every vector already
    * ingested. Embeddings are compact enough to live IN the index
    * (unlike document text), so verification is the EXACT fixed-point
    * cosine, not an estimate. One bucket equi-join + one append per
    * batch; the history is never re-hashed. Returns pairs
    * (a_id < b_id, cos_sim ≥ threshold) with at least one side in
    * `batch`; replay-safe via `txn` (re-appends no-op on the marker,
    * the (a,b)-distinct collapses re-seen index rows, and the probe
    * width derivation excludes this txn's own commit so a replay
    * sizes against the same pre-batch count).
    *
    * PROBE WIDTH AUTO-SCALES WITH THE INDEX (`planes = 0`, the
    * default): candidate volume per batch is
    * Σ_buckets |bucket∩batch|·|bucket|, so bucket count must grow
    * with index size. Buckets are STORED at [[StoredPlanes]] bits
    * (bit j = hyperplane j's sign, so any prefix is a valid coarser
    * bucket) and each probe masks down to
    * `clamp(ceil(log2(n / 200)), 4, 20)` bits, n = manifest row count
    * + batch — rows indexed at yesterday's size still match under
    * today's width. Measured on the 100× scale corpus (200k vectors,
    * ~7.5M true pairs): the fixed 4-bit probe took 388 s; 10 bits
    * (what auto derives at that n) 45 s at ~96% recall
    * (`tools.VecProbe` reproduces). Recall per TRUE near-dup pair at
    * angle θ is 1 − (1 − (1 − θ/π)^p)^bands — wider probes trade
    * recall for candidate volume, and `bands` (probe-time like the
    * width: every row stores all three disjoint 20-plane families)
    * buys it back at `bands`× candidate cost; an explicit `planes`
    * pins the width (storage is unaffected).
    *
    * BANDS AUTO-DERIVE TOO (`bands = 0`, the default):
    * [[bandsFor]](threshold, effective width,
    * [[DefaultTargetRecall]]) clamped to the stored families — the
    * same policy-becomes-default move as the width, so a caller gets
    * the band count the recall arithmetic says the threshold needs
    * instead of silently getting single-family recall (materially
    * worse at loose thresholds: RecallSpec measures ~2× at
    * θ = 0.45). Pass `bands` in [1, 3] to pin it. For dedup-at-ingest
    * prefer [[vecDedupStreamToTable]], whose kept-only index prevents
    * near-copy density from accumulating in buckets at all. */
  def nearDupIncremental(batch: DataFrame, idCol: String,
      threshold: Double, indexDir: String, embCol: String = "embedding",
      planes: Int = 0, txn: Option[(String, Long)] = None,
      maxBatchRows: Long = MaxIncrementalBatchRows,
      bands: Int = 0): DataFrame = {
    val r = nearDupIncrementalCore(batch, idCol, threshold, indexDir,
      embCol, planes, txn, maxBatchRows, bands)
    graft.sink.CdcTable.append(r.batchRows, indexDir, txn = txn)
    r.pairs
  }

  private final case class VecIncr(pairs: DataFrame, batchRows: DataFrame)

  /** Pair computation WITHOUT the index append — the caller decides
    * what enters the index ([[nearDupIncremental]] appends all,
    * [[vecDedupStreamToTable]] kept docs only). `pairs` pins the
    * pre-call index snapshot. */
  private def nearDupIncrementalCore(batch: DataFrame, idCol: String,
      threshold: Double, indexDir: String, embCol: String,
      planes: Int, txn: Option[(String, Long)],
      maxBatchRows: Long, bands: Int): VecIncr = {
    import graft.sink.CdcTable
    val spark = batch.sparkSession
    require(planes >= 0 && planes <= StoredPlanes,
      s"planes must be in [0 (auto), $StoredPlanes], got $planes")
    require(bands >= 0 && bands <= BandOffsets.length,
      s"bands must be in [0 (auto), ${BandOffsets.length}], got $bands")
    // NULL embeddings cannot hash or pair; keep them out of the index
    // (a NULL bval key would fall out of the bucket join anyway)
    val hashed = batch.filter(col(embCol).isNotNull)
      .select(col(idCol).as("id"), col(embCol).as("e"))
    // every band family's bucket is stored at full width; `planes`
    // records that width per row (observability + legacy adoption)
    val batchRows = BandOffsets.zipWithIndex
      .foldLeft(hashed) { case (df, (off, i)) =>
        df.withColumn(bandCol(i), bucketFor(hashed, "e",
          StoredPlanes, off))
      }
      .withColumn("planes", lit(StoredPlanes))
      .localCheckpoint() // pin: feeds the join AND the index append
    // the checkpointed batch counts for free; a corpus-sized "batch"
    // must fail loudly BEFORE its bucket keys broadcast
    val nBatch = batchRows.count()
    require(nBatch <= maxBatchRows,
      s"incremental batch has $nBatch rows (> maxBatchRows=" +
        s"$maxBatchRows): this API broadcasts the batch's bucket keys " +
        "and assumes bounded micro-batches — use nearDupPairs for a " +
        "corpus-sized input, or raise maxBatchRows if the broadcast " +
        "genuinely fits")
    // stored layout is pinned by the race-free sidecar; indexes from
    // before the sidecar stored one narrower bval — adopt their width
    // (the probe clamps to it; prefixes stay valid) and band count 1
    val meta = IndexMeta.ensure(indexDir,
      Map("bvalBits" -> StoredPlanes,
        "bvalBands" -> BandOffsets.length),
      legacy = () =>
        if (CdcTable.log(indexDir).isEmpty) None
        else {
          val vs = CdcTable.read(spark, indexDir)
            .select(col("planes")).distinct().collect().map(_.getInt(0))
          require(vs.length == 1,
            s"index at $indexDir stores mixed plane widths " +
              s"(${vs.sorted.mkString(", ")}) — rebuild it")
          Some(Map("bvalBits" -> vs.head, "bvalBands" -> 1))
        })
    val storedBits = meta.getOrElse("bvalBits", StoredPlanes)
    // sidecars written before banding existed carry no bvalBands key:
    // those indexes stored exactly one bucket column
    val storedBands = meta.getOrElse("bvalBands", 1)
    require(bands <= storedBands,
      s"index at $indexDir stores $storedBands band " +
        s"famil${if (storedBands == 1) "y" else "ies"} but this probe " +
        s"asks for $bands — historical rows have no bucket for the " +
        "extra bands (their keys would be NULL and silently match " +
        "nothing); rebuild the index or probe with fewer bands")
    // effective probe width: explicit, or derived from the index size
    // (manifest row counts — zero data IO; this txn's own commit is
    // excluded so a crash-replay derives the identical width)
    val p = math.min(storedBits,
      if (planes > 0) planes
      else autoPlanes(CdcTable.rowCountEstimate(indexDir, txn) + nBatch))
    // effective band count: explicit, or what the recall arithmetic
    // says the threshold needs at this width ([[autoBands]] — clamped
    // to the families the index actually stores)
    val nb = if (bands > 0) bands else autoBands(threshold, p, storedBands)
    val mask = (1L << p) - 1
    // one row per (vector, probed band): key = (band, masked bucket)
    def banded(df: DataFrame): DataFrame =
      (0 until nb).map { i =>
        df.select(col("id"), col("e"), lit(i).as("band"),
          col(bandCol(i)).bitwiseAND(lit(mask)).as("bkey"))
      }.reduce(_ unionByName _)
    val probe = banded(batchRows)
    // snapshot the log NOW: a later append must not leak this batch
    // into its own "historical" side
    val hist =
      if (CdcTable.log(indexDir).nonEmpty) {
        val h = banded(CdcTable.read(spark, indexDir)
          .select(col("id") +: col("e") +:
            (0 until nb).map(i => col(bandCol(i))): _*))
        // THE INDEX NEVER SHUFFLES: only touched buckets survive the
        // scan (the batch's ≤ bands·2^p distinct (band, key) pairs
        // broadcast; the index streams through a semi-join probe), so
        // the candidate join is bounded by touched-bucket volume, not
        // index size
        h.join(broadcast(probe.select(col("band"), col("bkey"))
            .distinct()),
          Seq("band", "bkey"), "left_semi")
      } else
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          probe.schema)
    val pairs = probe
      .select(col("id").as("l_id"), col("e").as("le"), col("band"),
        col("bkey"))
      .join(hist.unionByName(probe)
        .select(col("id").as("r_id"), col("e").as("re"), col("band"),
          col("bkey")),
        Seq("band", "bkey"))
      .filter(col("l_id") =!= col("r_id"))
      .withColumn("cos_sim", dotExpr(batch, "le", "re") / lit(1e12))
      .filter(col("cos_sim") >= threshold)
      .select(least(col("l_id"), col("r_id")).as("a_id"),
        greatest(col("l_id"), col("r_id")).as("b_id"), col("cos_sim"))
      .distinct() // both orientations of batch-batch pairs (the dot
                  // is bit-identical either way), replayed rows, and
                  // pairs colliding in several bands
    VecIncr(pairs, batchRows)
  }

  /** Streaming vector dedup-to-table: the embedding analog of
    * [[graft.ext.Dedup.nearDedupStreamToTable]] — every micro-batch
    * LSH-matches against the vector index, batch vectors whose EXACT
    * cosine against any earlier vector (historical, or a lower-id
    * vector in the same batch) reaches `threshold` are dropped, the
    * rest append to `outDir`. Only KEPT vectors enter the index
    * (bounded by the deduped corpus; copies are caught via the kept
    * survivor). Assumes non-decreasing ids across batches; exactly-
    * once across restarts via per-role txn markers.
    *
    * NULL-embedding rows cannot hash or compare: they pass through to
    * `outDir` unexamined and never enter the index — so identical
    * NULL-embedding rows are NOT deduplicated (unlike the text path,
    * where NULL text dedups as contentless), and outDir may hold more
    * rows than the index covers. Filter them upstream if that is not
    * the intent. */
  def vecDedupStreamToTable(stream: DataFrame, idCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      threshold: Double = 0.98, embCol: String = "embedding",
      planes: Int = 0, appId: String = "graft-vecdedup",
      maxBatchRows: Long = MaxIncrementalBatchRows,
      bands: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val r = nearDupIncrementalCore(batch, idCol, threshold,
          indexDir, embCol, planes, txn = Some((s"$appId-idx", id)),
          maxBatchRows = maxBatchRows, bands = bands)
        // one evaluation feeds the index filter AND the out anti-join
        val dupIds = r.pairs.select(col("b_id").as("__dup_id"))
          .distinct().localCheckpoint()
        graft.sink.CdcTable.append(
          r.batchRows.join(dupIds,
            col("id") === col("__dup_id"), "left_anti"),
          indexDir, txn = Some((s"$appId-idx", id)))
        graft.sink.CdcTable.append(
          batch.join(dupIds, batch(idCol) === col("__dup_id"),
            "left_anti"),
          outDir, txn = Some((s"$appId-out", id)))
        ()
      }
      .start()

  /** Fold the incremental vector index's per-batch append commits
    * into one compact file set — the vector analog of
    * [[graft.ext.Dedup.compactIndex]]. Duplicate rows (replays,
    * racing appenders re-indexing the same id) collapse via DISTINCT;
    * every surviving (id, e, bval) tuple is preserved bit-identically,
    * so probe results before and after the fold are equal (pairs are
    * set-semantics downstream). One replace commit, optimistic
    * concurrency — an append landing mid-fold wins and the fold
    * retries over the new snapshot; superseded files become vacuumable
    * orphans. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, retries: Int = 5): Unit = {
    import graft.sink.CdcTable
    require(CdcTable.log(indexDir).nonEmpty, s"no index at $indexDir")
    IndexMeta.foldWithRetry(retries) { () =>
      CdcTable.replaceWith(spark, indexDir,
        CdcTable.read(spark, indexDir).distinct(),
        expectedLastCommit = Some(CdcTable.log(indexDir).last.commit))
      ()
    }
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): partition the
    * embedding space into k-means cells, find within-cell pairs with
    * cosine ≥ threshold, and resolve each duplicate GROUP (connected
    * component of the pair graph — components never span cells since
    * pairs don't) to ONE kept exemplar: the member most central to
    * its cell (highest fixed-point dot with the assigned centroid,
    * ties to the smallest id) — SemDeDup's keep rule, the semantic
    * analog of [[graft.ext.Dedup.canonicalByQuality]].
    *
    * Returns one row per multi-member duplicate group:
    * (sem_cluster = min member id, kept_id, n_members, centroid_id).
    *
    * Scale shape: assignment is the literal-inlined codegen'd argmax
    * ([[ivfAssignLit]] — no centroid fan-out join, no shuffle); the
    * pair join is keyed on the cell id so candidate volume is
    * Σ|cell|², never n² (centroid count is the blocking knob — train
    * with [[kmeansFit]] at n/cell ≈ thousands); the CC iteration and
    * the keep-rule window run on the DUPLICATE subset only. */
  def semDedup(df: DataFrame, idCol: String, threshold: Double,
      cents: Seq[(Long, Array[Float])], embCol: String = "embedding")
  : DataFrame = {
    val spark = df.sparkSession
    val assigned = df.filter(col(embCol).isNotNull)
      .select(col(idCol).as("id"), col(embCol).as("e"))
      .withColumn("cid", ivfAssignLit(spark, "e", cents))
      .withColumn("cdot", ivfAssignDotLit(spark, "e", cents))
    semResolve(assigned, threshold)
  }

  /** [[semDedup]] with a centroid DATAFRAME (`cid`, `ce`) instead of
    * driver-side literals — the LARGE-k path. The literal argmax
    * inlines k·d floats into one generated method, which stops
    * scaling past ~64 centroids; here the centroid table BROADCASTS
    * into a fan-out join and the per-vector argmax is a map-side-
    * combinable max(struct(dot, −cid)) aggregation, so shuffle
    * volume is ONE row per vector regardless of k (the fan-out
    * collapses in the partial aggregate). Same assignment semantics
    * (ties to the smallest cid), bit-identical output — spec-pinned
    * against the literal path. Cell count is SemDeDup's blocking
    * knob: at 100 TB train k ≈ n/1000 centroids with [[kmeansFit]]
    * and pass them here. */
  def semDedupJoin(df: DataFrame, idCol: String, threshold: Double,
      centsDf: DataFrame, embCol: String = "embedding"): DataFrame = {
    val assigned = df.filter(col(embCol).isNotNull)
      .select(col(idCol).as("id"), col(embCol).as("e"))
      .crossJoin(broadcast(centsDf.select(col("cid"), col("ce"))))
      .withColumn("d", dotExpr(df, "e", "ce"))
      .groupBy(col("id"))
      .agg(max(struct(col("d").as("d"), (-col("cid")).as("nc")))
          .as("best"),
        first(col("e")).as("e")) // identical across the fan-out rows
      .select(col("id"), col("e"), (-col("best.nc")).as("cid"),
        col("best.d").as("cdot"))
    semResolve(assigned, threshold)
  }

  /** Shared back half of [[semDedup]]/[[semDedupJoin]]: cell-blocked
    * pairs → connected components → most-central keep rule, over an
    * `assigned(id, e, cid, cdot)` frame. */
  private def semResolve(assigned: DataFrame, threshold: Double)
  : DataFrame = {
    val spark = assigned.sparkSession
    val a = assigned.select(col("id").as("a_id"), col("e").as("ea"),
      col("cid"))
    val b = assigned.select(col("id").as("b_id"), col("e").as("eb"),
      col("cid").as("bcid"))
    val pairs = a
      .join(b, col("cid") === col("bcid") && col("a_id") < col("b_id"))
      .filter(dotExpr(assigned, "ea", "eb") / lit(1e12) >= threshold)
      .select(col("a_id"), col("b_id"))
    val comps = Dedup.connectedComponents(spark, pairs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("cdot").desc, col("id").asc)
    comps.join(assigned.select(col("id"), col("cid"), col("cdot")),
        Seq("id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("component"))
      .agg(max(when(col("rn") === 1, col("id"))).as("kept_id"),
        count(lit(1)).as("n_members"),
        max(col("cid")).as("centroid_id")) // cell-local ⇒ all equal
      .select(col("component").as("sem_cluster"), col("kept_id"),
        col("n_members"), col("centroid_id"))
  }

  /** INCREMENTAL SemDeDup — the cell-blocked semantic dedup applied
    * batch-at-a-time against a persisted KEPT-ONLY index (the
    * [[nearDupIncremental]] shape with the cell id as the blocking
    * key): each batch vector is argmax-assigned to its centroid cell
    * ([[ivfAssignLit]] — no join, no shuffle) and DROPPED when its
    * exact fixed-point cosine against any earlier same-cell vector —
    * a historical KEPT exemplar, or any lower-id member of the same
    * batch — reaches `threshold`; survivors append to the index as
    * (id, e, cid). The offline [[semDedup]] resolves whole duplicate
    * groups to the most-CENTRAL member; online that rule is
    * unavailable (an already-shipped exemplar cannot be revoked), so
    * the incremental path keeps the FIRST arrival (lowest id) — the
    * only online-consistent keep rule, same divergence every
    * streaming dedup in this library makes.
    *
    * Returns the batch's duplicate evidence (a_id, b_id, cos_sim)
    * with b_id the dropped side — a_id < b_id covers both cases
    * because ids are assumed non-decreasing across batches (the
    * incremental-family contract). Replay-safe with `txn`: the
    * re-appended batch no-ops on the marker, and a replayed batch's
    * own kept rows in the index cannot re-match it (strict id
    * inequality), so the same rows drop again.
    *
    * Scale shape: CENTROIDS ARE THE MODEL and must stay FIXED for
    * the life of the index (they define the blocking — re-fitting
    * them would strand history in stale cells; train once with
    * [[kmeansFit]], version the index to adopt a re-fit). The index
    * never shuffles: the batch's distinct cell ids broadcast and the
    * index streams through a semi-join probe, so per-batch cost is
    * batch + touched-CELL volume — and because the index holds only
    * kept exemplars, a cell's population is bounded by its semantic
    * diversity at `threshold`, not by how many near-copies ever
    * arrived. */
  def semDedupIncremental(batch: DataFrame, idCol: String,
      threshold: Double, cents: Seq[(Long, Array[Float])],
      indexDir: String, embCol: String = "embedding",
      txn: Option[(String, Long)] = None,
      maxBatchRows: Long = MaxIncrementalBatchRows): DataFrame = {
    require(cents.nonEmpty, "need at least one centroid")
    val r = semDedupIncrementalCore(batch, idCol, threshold,
      df => df.withColumn("cid",
        ivfAssignLit(batch.sparkSession, "e", cents)),
      indexDir, embCol, txn, maxBatchRows)
    appendKept(r, indexDir, txn)
    r.pairs
  }

  /** [[semDedupIncremental]] with a centroid DATAFRAME — the LARGE-k
    * incremental path (the [[semDedupJoin]] move applied online):
    * the literal argmax stops scaling past ~64 centroids, which caps
    * the cell count and lets within-cell pair volume grow quadratic
    * in corpus size; here the centroid table broadcasts into a
    * fan-out join whose per-vector argmax is a map-side-combinable
    * max(struct) — shuffle volume one row per batch vector regardless
    * of k, so the cell count (SemDeDup's blocking knob) keeps pace
    * with the corpus. Assignment semantics identical to the literal
    * path (ties to the smallest cid; spec-pinned), and the index is
    * interchangeable between the two. Same fixed-centroid contract:
    * the model defines the blocking for the life of the index. */
  def semDedupIncrementalJoin(batch: DataFrame, idCol: String,
      threshold: Double, centsDf: DataFrame, indexDir: String,
      embCol: String = "embedding",
      txn: Option[(String, Long)] = None,
      maxBatchRows: Long = MaxIncrementalBatchRows): DataFrame = {
    val r = semDedupIncrementalCore(batch, idCol, threshold,
      df => df
        .crossJoin(broadcast(centsDf.select(col("cid"), col("ce"))))
        .withColumn("d", dotExpr(df, "e", "ce"))
        .groupBy(col("id"))
        .agg(max(struct(col("d").as("d"), (-col("cid")).as("nc")))
            .as("best"),
          first(col("e")).as("e"))
        .select(col("id"), col("e"), (-col("best.nc")).as("cid")),
      indexDir, embCol, txn, maxBatchRows)
    appendKept(r, indexDir, txn)
    r.pairs
  }

  private def appendKept(r: SemIncr, indexDir: String,
      txn: Option[(String, Long)]): Unit = {
    val dup = r.pairs.select(col("b_id")).distinct()
    graft.sink.CdcTable.append(
      r.assigned.join(dup, r.assigned("id") === dup("b_id"),
        "left_anti"),
      indexDir, txn = txn)
  }

  private final case class SemIncr(pairs: DataFrame, assigned: DataFrame)

  /** Pair computation without the index append — `pairs` pins the
    * pre-call index snapshot ([[graft.sink.CdcTable.read]] fixes the
    * file list at construction). */
  private def semDedupIncrementalCore(batch: DataFrame, idCol: String,
      threshold: Double, assign: DataFrame => DataFrame,
      indexDir: String, embCol: String, txn: Option[(String, Long)],
      maxBatchRows: Long): SemIncr = {
    import graft.sink.CdcTable
    val spark = batch.sparkSession
    val assigned = assign(batch.filter(col(embCol).isNotNull)
        .select(col(idCol).as("id"), col(embCol).as("e")))
      .select(col("id"), col("e"), col("cid"))
      .localCheckpoint() // pin: feeds the join AND the index append
    val nBatch = assigned.count()
    require(nBatch <= maxBatchRows,
      s"incremental batch has $nBatch rows (> maxBatchRows=" +
        s"$maxBatchRows): this API broadcasts the batch's cell keys " +
        "and assumes bounded micro-batches — use semDedup for a " +
        "corpus-sized input, or raise maxBatchRows if the broadcast " +
        "genuinely fits")
    val earlier = assigned
      .select(col("id").as("a_id"), col("e").as("ea"), col("cid"))
    val hist =
      if (CdcTable.log(indexDir).nonEmpty)
        // THE INDEX NEVER SHUFFLES: the batch's distinct cell ids
        // broadcast; only touched cells survive the scan
        CdcTable.read(spark, indexDir)
          .select(col("id").as("a_id"), col("e").as("ea"), col("cid"))
          .join(broadcast(assigned.select(col("cid")).distinct()),
            Seq("cid"), "left_semi")
      else
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          earlier.schema)
    val pairs = assigned
      .select(col("id").as("b_id"), col("e").as("eb"), col("cid"))
      .join(hist.unionByName(earlier), Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim", dotExpr(batch, "ea", "eb") / lit(1e12))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
      .distinct() // a replayed batch's kept rows sit in BOTH legs
    SemIncr(pairs, assigned)
  }

  /** Streaming SemDeDup-to-table — the semantic analog of
    * [[vecDedupStreamToTable]]: every micro-batch runs
    * [[semDedupIncremental]] against the kept-exemplar index; dropped
    * rows vanish, survivors append (with ALL their original columns)
    * to `outDir` and (as (id, e, cid)) to the index. Exactly-once
    * across restarts via per-role txn markers; the centroid model is
    * passed in and must stay fixed for the life of the index (see
    * [[semDedupIncremental]]). NULL-embedding rows cannot assign or
    * compare: they pass through to `outDir` unexamined and never
    * enter the index. */
  def semDedupStreamToTable(stream: DataFrame, idCol: String,
      cents: Seq[(Long, Array[Float])], indexDir: String,
      outDir: String, checkpointDir: String, threshold: Double = 0.40,
      embCol: String = "embedding", appId: String = "graft-semdedup",
      maxBatchRows: Long = MaxIncrementalBatchRows)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(cents.nonEmpty, "need at least one centroid")
    semDedupStreamGlue(stream, idCol,
      df => df.withColumn("cid",
        ivfAssignLit(stream.sparkSession, "e", cents)),
      indexDir, outDir, checkpointDir, threshold, embCol, appId,
      maxBatchRows)
  }

  /** [[semDedupStreamToTable]] with a centroid DATAFRAME — the
    * LARGE-k streaming configuration ([[semDedupIncrementalJoin]]'s
    * assignment inside the glue): at stream scale the cell model
    * wants thousands of cells, past the literal argmax's ~64-centroid
    * ceiling. The centroid frame is re-resolved per micro-batch
    * evaluation, but the fixed-centroid contract still holds — the
    * model defines the blocking for the life of the index; point the
    * frame at an immutable artifact. */
  def semDedupStreamToTableJoin(stream: DataFrame, idCol: String,
      centsDf: DataFrame, indexDir: String,
      outDir: String, checkpointDir: String, threshold: Double = 0.40,
      embCol: String = "embedding", appId: String = "graft-semdedup",
      maxBatchRows: Long = MaxIncrementalBatchRows)
      : org.apache.spark.sql.streaming.StreamingQuery =
    semDedupStreamGlue(stream, idCol,
      df => df
        .crossJoin(broadcast(centsDf.select(col("cid"), col("ce"))))
        .withColumn("d", dotExpr(df, "e", "ce"))
        .groupBy(col("id"))
        .agg(max(struct(col("d").as("d"), (-col("cid")).as("nc")))
            .as("best"),
          first(col("e")).as("e"))
        .select(col("id"), col("e"), (-col("best.nc")).as("cid")),
      indexDir, outDir, checkpointDir, threshold, embCol, appId,
      maxBatchRows)

  private def semDedupStreamGlue(stream: DataFrame, idCol: String,
      assign: DataFrame => DataFrame, indexDir: String,
      outDir: String, checkpointDir: String, threshold: Double,
      embCol: String, appId: String, maxBatchRows: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val r = semDedupIncrementalCore(batch, idCol, threshold,
          assign, indexDir, embCol, txn = Some((s"$appId-idx", id)),
          maxBatchRows = maxBatchRows)
        // one evaluation feeds the index filter AND the out anti-join
        val dupIds = r.pairs.select(col("b_id").as("__dup_id"))
          .distinct().localCheckpoint()
        graft.sink.CdcTable.append(
          r.assigned.join(dupIds,
            col("id") === col("__dup_id"), "left_anti"),
          indexDir, txn = Some((s"$appId-idx", id)))
        graft.sink.CdcTable.append(
          batch.join(dupIds, batch(idCol) === col("__dup_id"),
            "left_anti"),
          outDir, txn = Some((s"$appId-out", id)))
        ()
      }
      .start()

  /** All pairs with cosine ≥ threshold — exact exhaustive O(n²) pair
    * join. Correctness baseline / small inputs only; the default
    * [[nearDupPairs]] band-blocks first. */
  def nearDupPairsExact(df: DataFrame, idCol: String, threshold: Double,
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

  /** Codegen'd argmax-centroid column: the centroid vectors are
    * inlined as literals (they are the broadcast side by construction)
    * and the argmax is `greatest(struct(dot, -cid))` — one projection
    * per row, no centroid fan-out join, no shuffle. Ties break to the
    * smallest cid. */
  def ivfAssignLit(spark: org.apache.spark.sql.SparkSession,
      embCol: String, cents: Seq[(Long, Array[Float])]): Column = {
    require(cents.nonEmpty, "need at least one centroid")
    val best = greatest(cents.map { case (cid, vec) =>
      struct(expr(dotSql(spark, embCol, litFloatArraySql(vec))).as("d"),
        lit(-cid).as("nc"))
    }.toIndexedSeq: _*)
    -best.getField("nc")
  }

  /** [[ivfAssignLit]]'s companion: the fixed-point dot product TO the
    * assigned (nearest) centroid — same single codegen'd projection;
    * callers needing both columns pay the argmax once per column (the
    * optimizer CSEs the shared struct list within one projection). */
  def ivfAssignDotLit(spark: org.apache.spark.sql.SparkSession,
      embCol: String, cents: Seq[(Long, Array[Float])]): Column = {
    require(cents.nonEmpty, "need at least one centroid")
    greatest(cents.map { case (cid, vec) =>
      struct(expr(dotSql(spark, embCol, litFloatArraySql(vec))).as("d"),
        lit(-cid).as("nc"))
    }.toIndexedSeq: _*).getField("d")
  }

  /** Distributed Lloyd's k-means over an embedding column — the IVF
    * centroid TRAINER ([[AnnIndex.writeIvf]] consumes the result).
    *
    * Scale shape per iteration: the assignment is ONE codegen'd
    * projection (centroid literals ride into the scan via
    * [[ivfAssignLit]] — no fan-out join, no shuffle of the corpus);
    * the recompute is posexplode → groupBy(cid, dim) with MAP-SIDE
    * partial aggregation, so each partition emits ≤ k·d narrow rows
    * and only those shuffle. Driver traffic is k·d sums per iteration
    * (centroids must reach the driver anyway to become next-round
    * literals).
    *
    * Deterministic by construction: seeding takes the k smallest
    * `idCol` vectors (no RNG — reruns and re-partitioned inputs give
    * identical models) and the per-dimension sums are exact
    * fixed-point BIGINTs (order-independent regardless of partial-agg
    * order), so every run yields bit-identical centroids. Empty
    * clusters keep their previous centroid. */
  def kmeansFit(df: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int = 5): Seq[(Long, Array[Float])] = {
    require(k >= 1 && iters >= 1, s"need k/iters >= 1, got $k/$iters")
    val spark = df.sparkSession
    var cents: Seq[(Long, Array[Float])] = df
      .select(col(idCol), col(embCol))
      .orderBy(col(idCol)).limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        i.toLong -> r.getSeq[Float](1).toArray }
      .toSeq
    // fewer rows than k: every point is its own centroid, no iteration
    // can move anything — return the seeds (also guards empty input)
    require(cents.nonEmpty, "kmeansFit: input has no rows")
    if (cents.size < k) return cents
    val dims = cents.head._2.length
    for (_ <- 0 until iters) {
      val sums = df
        .withColumn("cid", ivfAssignLit(spark, embCol, cents))
        .select(col("cid"), posexplode(col(embCol)).as(Seq("dim", "v")))
        // exact fixed-point sum: order-independent across partial
        // aggregation, so the fit is deterministic run-to-run
        .groupBy(col("cid"), col("dim"))
        .agg(sum(expr("CAST(ROUND(v * 1e6) AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCid = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, prev) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val next = new Array[Float](dims)
            rows.foreach { r =>
              next(r.getInt(1)) =
                (r.getLong(2).toDouble / r.getLong(3) / 1e6).toFloat
            }
            cid -> next
          case None => cid -> prev // empty cluster: keep centroid
        }
      }
    }
    cents
  }

  /** Driver-side fixed-point dot (mirror of `fixed_dot`). */
  def dotFixedOf(a: Array[Float], b: Array[Float]): Long = {
    require(a.length == b.length, "length mismatch")
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += graft.functions.FixedDot.roundAway(
        a(i).toDouble * b(i).toDouble * 1e12)
      i += 1
    }
    acc
  }

  /** Driver-side mirror of [[ivfAssignLit]] for probe-time literal
    * cluster ids (static partition pruning needs a literal). */
  def assignOf(vec: Array[Float], cents: Seq[(Long, Array[Float])]): Long =
    cents.map { case (cid, c) => (dotFixedOf(vec, c), -cid) }.max._2 * -1

  /** Top-`nprobe` centroid ids for a query vector (dot desc, ties to
    * the smaller cid) — the IVF `nprobe` recall knob's driver-side
    * face (FAISS's nprobe): a near neighbor whose cluster narrowly
    * lost the argmax is recovered by probing the runner-up clusters.
    * Linear probe cost, zero index change — the IVF analog of
    * [[multiProbeBuckets]]. */
  def assignTopN(vec: Array[Float], cents: Seq[(Long, Array[Float])],
      nprobe: Int): Seq[Long] = {
    require(nprobe >= 1 && nprobe <= cents.size,
      s"nprobe must be in [1, ${cents.size}]: $nprobe")
    cents.map { case (cid, c) => (dotFixedOf(vec, c), cid) }
      .sortBy { case (d, cid) => (-d, cid) }
      .take(nprobe).map(_._2).toSeq
  }

  /** Per-row ARRAY of the `nprobe` nearest centroid ids (dot desc,
    * ties to the smaller cid) — [[ivfAssignLit]] generalized for a
    * DISTRIBUTED query side: still one codegen'd projection with the
    * centroids inlined as literals, no fan-out join, no shuffle. The
    * ascending struct sort over (dot, −cid) reversed yields exactly
    * the (dot desc, cid asc) order the driver mirror uses. */
  def ivfAssignTopNLit(spark: org.apache.spark.sql.SparkSession,
      embCol: String, cents: Seq[(Long, Array[Float])],
      nprobe: Int): Column = {
    require(cents.nonEmpty, "need at least one centroid")
    require(nprobe >= 1 && nprobe <= cents.size,
      s"nprobe must be in [1, ${cents.size}]: $nprobe")
    val structs = cents.map { case (cid, vec) =>
      struct(expr(dotSql(spark, embCol, litFloatArraySql(vec))).as("d"),
        lit(-cid).as("nc"))
    }.toIndexedSeq
    transform(
      slice(reverse(array_sort(array(structs: _*))), 1, nprobe),
      x => -x.getField("nc"))
  }

  // ------------------------------------------------------------------
  // Product quantization (ADC) — Jégou et al., "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011, in the inner-product
  // metric this engine's fixed-point dot defines. A d-dim vector is
  // split into m subvectors; each is replaced by the id of its
  // max-dot codebook entry, so the corpus stores m small ints per
  // vector (64 float dims → 4 bytes at m=4, k≤256 — the embedding
  // column compresses ~64×). Query scoring is ADC: one (m × k)
  // lookup table of exact fixed-point sub-dots, then a doc's score is
  // the sum of m table lookups — integer arithmetic end to end, so
  // Spark and SQL oracles agree bit-for-bit.
  // ------------------------------------------------------------------

  /** Sampled codebooks: code c of subvector s is row c's subvector s
    * (the first `codes` ids serve as the sample). Deterministic and
    * SQL-derivable — the oracle-checkable counterpart of
    * [[pqTrainCodebooks]] (same trick as q39's first-8-rows
    * centroids vs q75's trained ones). */
  def pqCodebooksFromRows(df: DataFrame, idCol: String, embCol: String,
      m: Int = 4, codes: Int = 16)
  : IndexedSeq[IndexedSeq[Array[Float]]] = {
    val rows = df.filter(col(idCol) < codes)
      .select(col(idCol).cast("long"), col(embCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toIndexedSeq
    require(rows.length == codes,
      s"need ids 0..${codes - 1} as codebook sample, found ${rows.length}")
    pqSplit(rows.map(_._2), m)
  }

  /** TRAINED codebooks: per-subvector Lloyd's k-means
    * ([[kmeansFit]] on each slice). The real quality path; spec-
    * checked (an iterative fit cannot be replayed by a SQL oracle). */
  def pqTrainCodebooks(df: DataFrame, idCol: String, embCol: String,
      m: Int = 4, codes: Int = 16, iters: Int = 5)
  : IndexedSeq[IndexedSeq[Array[Float]]] = {
    val d = df.select(size(col(embCol))).head().getInt(0)
    require(d % m == 0, s"dim $d must split into $m subvectors")
    val w = d / m
    (0 until m).map { s =>
      kmeansFit(df.select(col(idCol),
          expr(s"slice($embCol, ${s * w + 1}, $w)").as(embCol)),
        idCol, embCol, codes, iters)
        .sortBy(_._1).map(_._2).toIndexedSeq
    }.toIndexedSeq
  }

  private def pqSplit(vecs: IndexedSeq[Array[Float]], m: Int)
  : IndexedSeq[IndexedSeq[Array[Float]]] = {
    val d = vecs.head.length
    require(d % m == 0, s"dim $d must split into $m subvectors")
    val w = d / m
    IndexedSeq.tabulate(m)(s =>
      vecs.map(v => v.slice(s * w, (s + 1) * w)))
  }

  /** Per-row PQ code ARRAY (m BIGINT codes, each the max-dot codebook
    * entry of its subvector, ties to the smaller code): ONE codegen'd
    * projection with the codebook entries inlined as literals — no
    * join, no shuffle, the same literal-argmax shape as
    * [[ivfAssignLit]]. */
  def pqEncodeLit(spark: org.apache.spark.sql.SparkSession,
      embCol: String, books: IndexedSeq[IndexedSeq[Array[Float]]])
  : Column = {
    val w = books.head.head.length
    array(books.zipWithIndex.map { case (book, s) =>
      val sub = s"slice($embCol, ${s * w + 1}, $w)"
      -greatest(book.zipWithIndex.map { case (cv, c) =>
        struct(expr(dotSql(spark, sub, litFloatArraySql(cv))).as("d"),
          lit(-c.toLong).as("nc"))
      }: _*).getField("nc")
    }: _*)
  }

  /** The query's ADC lookup table: exact fixed-point dot of each
    * codebook entry with the query's matching subvector. (m × k)
    * longs — driver-side, bounded, feeds [[pqAdcLit]] as literals. */
  def pqLut(queryVec: Array[Float],
      books: IndexedSeq[IndexedSeq[Array[Float]]])
  : IndexedSeq[IndexedSeq[Long]] = {
    val w = books.head.head.length
    books.zipWithIndex.map { case (book, s) =>
      val qs = queryVec.slice(s * w, (s + 1) * w)
      book.map(cv => dotFixedOf(qs, cv))
    }
  }

  /** ADC score from a PQ code array column: Σ over subvectors of the
    * query's lookup-table entry for the stored code — m literal-array
    * `element_at`s summed, a scan-speed projection over the COMPRESSED
    * column (the raw embedding is not read at all). */
  def pqAdcLit(codesCol: String,
      lut: IndexedSeq[IndexedSeq[Long]]): Column =
    lut.zipWithIndex.map { case (row, s) =>
      element_at(array(row.map(lit): _*),
        (col(codesCol).getItem(s) + 1).cast("int"))
    }.reduce(_ + _)

  /** Per-QUERY-ROW ADC lookup table as an array<array<bigint>>
    * column: entry [s][c] is the exact fixed-point dot of the row's
    * s-th subvector with codebook entry c (the codebook inlined as
    * literals — the distributed form of [[pqLut]], bit-identical by
    * construction). m·codes dot projections, codegen'd, no join. */
  def pqLutLit(spark: org.apache.spark.sql.SparkSession,
      embCol: String, books: IndexedSeq[IndexedSeq[Array[Float]]])
  : Column = {
    val w = books.head.head.length
    array(books.zipWithIndex.map { case (book, s) =>
      val sub = s"slice($embCol, ${s * w + 1}, $w)"
      array(book.map(cv =>
        expr(dotSql(spark, sub, litFloatArraySql(cv))).cast("long")): _*)
    }: _*)
  }

  /** ADC score from a codes COLUMN and a luts COLUMN (both sides
    * row-dependent — the batched-join form of [[pqAdcLit]]): m is
    * known statically, so the sum expands to m nested `element_at`
    * lookups — plain codegen'd expressions that stay inside
    * whole-stage codegen. (A HOF formulation — aggregate over
    * zip_with — computes the same value but evaluates INTERPRETED:
    * measured 49 s vs 1.2 s for q111's 3M-pair join at sf0.1.) */
  def pqAdcCols(codesCol: String, lutsCol: String, m: Int): Column =
    (0 until m).map { s =>
      element_at(element_at(col(lutsCol), s + 1),
        (element_at(col(codesCol), s + 1) + 1).cast("int"))
    }.reduce(_ + _)

  /** Driver mirrors of [[pqEncodeLit]] / [[pqAdcLit]] (bit-identical
    * by construction; spec-asserted on random vectors). */
  def pqEncodeOf(vec: Array[Float],
      books: IndexedSeq[IndexedSeq[Array[Float]]]): IndexedSeq[Long] = {
    val w = books.head.head.length
    books.zipWithIndex.map { case (book, s) =>
      val sub = vec.slice(s * w, (s + 1) * w)
      book.zipWithIndex
        .map { case (cv, c) => (dotFixedOf(sub, cv), -c.toLong) }
        .max._2 * -1
    }
  }

  def pqAdcOf(codes: IndexedSeq[Long],
      lut: IndexedSeq[IndexedSeq[Long]]): Long =
    codes.zipWithIndex.map { case (c, s) => lut(s)(c.toInt) }.sum

  /** Assign every row to its max-dot centroid (IVF coarse quantizer).
    * `centroids` must have (cid, ce) columns; it is broadcast. The
    * argmax is a map-side-combinable `max_by` aggregation (partial agg
    * collapses the centroid fan-out before the single shuffle — no
    * global window sort). Ties break to the smallest cid.
    *
    * AT SCALE PREFER [[ivfAssignLit]]: when the centroids fit the
    * driver (they almost always do — k·d floats), inlining them as
    * literals turns the k-way row fan-out + shuffle here into ONE
    * codegen'd projection with no exchange at all, and composes with
    * write-time bucket partitioning ([[AnnIndex.writeIvf]]) for
    * partition-pruned probes. Use THIS variant only when the centroid
    * set is itself a big/lazily-computed frame that must not collect
    * (e.g. mid-pipeline centroids at large k). */
  def ivfAssign(df: DataFrame, centroids: DataFrame,
      embCol: String = "embedding"): DataFrame = {
    df.withColumn("__rid", monotonically_increasing_id())
      .crossJoin(broadcast(centroids))
      .withColumn("cdot", dotExpr(df, embCol, "ce"))
      .groupBy(col("__rid"))
      .agg(max_by(
        struct(df.columns.map(col).toIndexedSeq :+ col("cid"): _*),
        struct(col("cdot"), (-col("cid")).as("nc"))).as("best"))
      .select(col("best.*"))
  }

  /** Rows whose `dotCol` falls below (num/den) of their cluster's
    * mean — the outlier filter behind q79. The cross-multiplied
    * comparison `dot·den·n < s·num` runs in DECIMAL(38,0) END TO END
    * (the sum too): BIGINT fixed-point sums overflow at ~9e5 rows per
    * cluster at unit-norm 1e12-scale dots, and a 100 TB corpus blows
    * past that trivially. DECIMAL(38,0) keeps the comparison exact to
    * 38 digits (≈1e26 rows/cluster) with zero float rounding, so the
    * result still hash-matches an engine computing in int128. The
    * 8-ish-row stats frame broadcasts back; the corpus pays one
    * combinable aggregation. */
  def clusterMeanOutliers(assigned: DataFrame, num: Int = 8,
      den: Int = 10, dotCol: String = "dot_fx",
      cidCol: String = "cid"): DataFrame = {
    val stats = assigned.groupBy(col(cidCol))
      .agg(sum(col(dotCol).cast("decimal(38,0)")).as("__s"),
        count(lit(1)).as("__n"))
    assigned.join(broadcast(stats), Seq(cidCol))
      .filter(col(dotCol).cast("decimal(38,0)") * den * col("__n") <
        col("__s") * num)
      .drop("__s", "__n")
  }

  /** Per-vector int8 symmetric quantization quality: adds `q_scale`
    * (= max|x| / 127, the dequantization step) and `q_err` (mean
    * absolute reconstruction error of round-to-int8-and-back). The
    * storage trade a 100 TB embedding corpus makes before ANN
    * indexing is 4× compression for a small recall loss — this
    * measures that loss per vector, scan-speed, shuffle-free.
    *
    * Every step is engine-portable: per-element IEEE double
    * arithmetic with half-away-from-zero rounds, error terms summed
    * exactly in fixed point (order-independent BIGINT sum) before one
    * final division. */
  def int8QuantStats(df: DataFrame, embCol: String = "embedding")
      : DataFrame =
    df.withColumn("qv",
        expr(s"transform($embCol, x -> CAST(x AS DOUBLE))"))
      .withColumn("q_scale",
        expr("array_max(transform(qv, x -> abs(x))) / 127.0D"))
      .withColumn("q_err", expr(
        """CASE WHEN q_scale = 0D THEN 0D ELSE
          |  CAST(aggregate(qv, 0L, (acc, x) -> acc +
          |    CAST(ROUND(ABS(x - ROUND(x / q_scale) * q_scale) * 1e7)
          |      AS BIGINT)) AS DOUBLE) / 1e7 / size(qv)
          |END""".stripMargin))
      .drop("qv")

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * SIGIR 1998): greedily select `k` of the candidate rows
    * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — the
    * standard diversification pass a retrieval stack runs AFTER
    * top-N recall, so near-duplicate hits don't crowd the result
    * list. λ is held as tenths (`lambdaTenths`/10), keeping the
    * objective in exact BIGINT fixed point:
    * `mmr_fp = λt·rel_fp − (10−λt)·max_sim_fp`, ties by id asc.
    *
    * Input: `(id BIGINT, embedding, rel_fp BIGINT)` — the ALREADY
    * k-bounded candidate list of an ANN/brute top-N stage.
    *
    * Scale shape: MMR is inherently sequential in k, so the right
    * 100 TB design is to keep recall distributed (the existing
    * brute/LSH/IVF/PQ stages) and re-rank the k-BOUNDED residue at
    * the driver: pairwise sims are one bounded crossJoin (N² rows,
    * N ≤ `maxCandidates` — loud reject above, the driverEdgeLimit
    * pattern), then the greedy loop is metadata-scale. Output rows
    * `(step, id, rel_fp, max_sim_fp, mmr_fp)`; step 1 is pure
    * relevance (max_sim_fp = 0). */
  def mmrRerank(cand: DataFrame, k: Int, lambdaTenths: Int = 7,
      embCol: String = "embedding", maxCandidates: Int = 512)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be in [0, 10]: $lambdaTenths")
    val spark = cand.sparkSession
    val rels = cand.select(col("id"), col("rel_fp"))
      .limit(maxCandidates + 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    require(rels.length <= maxCandidates,
      s"mmrRerank: candidate list exceeds maxCandidates=" +
        s"$maxCandidates — re-rank the TOP-N residue of a recall " +
        s"stage, not a corpus")
    val c2 = cand.select(col("id"), col(embCol).as("e"))
    val simRows = c2.as("a").crossJoin(c2.as("b"))
      .filter(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ai"), col("b.id").as("bi"),
        expr(dotSql(spark, "a.e", "b.e")).as("s"))
      .collect()
    val sim = new java.util.HashMap[(Long, Long), Long]()
    simRows.foreach(r => sim.put((r.getLong(0), r.getLong(1)),
      r.getLong(2)))
    val lt = lambdaTenths.toLong
    val remaining = scala.collection.mutable.SortedMap[Long, Long]() ++=
      rels
    val chosen = scala.collection.mutable.ArrayBuffer[Long]()
    val out =
      scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long)]()
    var step = 1
    while (step <= k && remaining.nonEmpty) {
      var bestId = -1L; var bestRel = 0L; var bestMs = 0L
      var bestMmr = Long.MinValue
      for ((id, rel) <- remaining) {
        val ms =
          if (chosen.isEmpty) 0L
          else chosen.map(s => sim.get((id, s)).longValue).max
        val mmr = lt * rel - (10L - lt) * ms
        if (mmr > bestMmr || (mmr == bestMmr && id < bestId)) {
          bestId = id; bestRel = rel; bestMs = ms; bestMmr = mmr
        }
      }
      out += ((step, bestId, bestRel, bestMs, bestMmr))
      chosen += bestId
      remaining.remove(bestId)
      step += 1
    }
    import spark.implicits._
    out.toSeq.toDF("step", "id", "rel_fp", "max_sim_fp", "mmr_fp")
  }

  /** Margin-based bitext mining (Artetxe & Schwenk ACL 2019 — the
    * LASER/CCMatrix parallel-corpus miner): candidate pairs are the
    * union of both directions' k-NN lists, scored by the RATIO margin
    *   margin(x, y) = cos(x, y) / ((Σ NN_k(x) + Σ NN_k(y)) / 2k)
    * — a hit only counts if it beats what x and y score against their
    * ordinary neighborhoods, which kills hub vectors that are "close
    * to everything". Every x keeps its best-margin y above
    * `thresholdFp` (the "max" strategy). Fixed point:
    * `margin_fp = (s·2k·10^6) div (Σx + Σy)` in 38-digit integers
    * (s ≈ 10^12 · 2k · 10^6 overflows BIGINT), emitted only where the
    * neighborhood mass is positive.
    *
    * Scale shape: two k-NN joins (brute here — the correctness
    * baseline; compose [[knnJoinLsh]]/[[knnJoinIvf]] for the 100 TB
    * recall stage), two k-bounded per-id sums, one union-dedup of
    * k-bounded pair lists, a broadcast-sized join back of the two
    * mass tables, and a per-x top-1 window over ≤ 2k rows per x.
    * Nothing touches |src|·|tgt|. Output:
    * (src_id, tgt_id, score_fp, margin_fp). */
  /** k-center greedy coreset selection (farthest-point sampling —
    * Sener & Savarese ICLR 2018's active-learning coreset rule, and
    * the classic 2-approximation to the k-center cover): starting
    * from `seedId`, repeatedly pick the point whose MOST-similar
    * already-chosen exemplar is smallest — the point worst covered by
    * the current set. For unit vectors max-cosine order is min-
    * distance order, so coverage stays in the exact fixed-point dot
    * domain; ties by id asc. Output `(step, id, cov_fp)` — `cov_fp` =
    * the winner's max dot to the prior set (0 for the seed).
    *
    * Scale shape: the dual of [[mmrRerank]] — selection runs over the
    * WHOLE frame, so nothing collects but the k winners: each round
    * broadcasts the ≤ k chosen vectors, computes per-row max-dot in
    * one narrow scan (k dots/row), and takes the argmin via a
    * 1-row TakeOrdered (the BPE-argmax pattern). k sequential jobs,
    * k²·n dots total — the standard price of the greedy rule; for
    * 100 TB corpora run it per IVF/LSH cell and union the coresets.
    *
    * INTENDED k REGIME (measured, `tools/KcProbe`): each round is a
    * full job wave, so this shape is right for k up to the hundreds;
    * past that the scheduler dominates the arithmetic — switch to
    * [[kCenterGreedyLocal]] (exact-equal, spec-pinned) over a
    * bounded per-cell / sampled residue. */
  def kCenterGreedy(df: DataFrame, idCol: String, k: Int, seedId: Long,
      embCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"),
      col(embCol).as("e"))
    require(base.filter(col("id") === seedId).count() == 1,
      s"kCenterGreedy: seed id $seedId absent (or duplicated)")
    var chosenIds = Set(seedId)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)](
      (1, seedId, 0L))
    var step = 2
    var exhausted = false
    while (step <= k && !exhausted) {
      val chosenDf = base.filter(col("id").isInCollection(chosenIds))
        .select(col("id").as("cid"), col("e").as("ce"))
      val pick = base.filter(!col("id").isInCollection(chosenIds))
        .crossJoin(broadcast(chosenDf))
        .select(col("id"), expr(dotSql(spark, "e", "ce")).as("s"))
        .groupBy("id").agg(max(col("s")).as("cov"))
        .orderBy(col("cov").asc, col("id").asc).limit(1).collect()
      if (pick.isEmpty) exhausted = true
      else {
        out += ((step, pick(0).getLong(0), pick(0).getLong(1)))
        chosenIds += pick(0).getLong(0)
        step += 1
      }
    }
    import spark.implicits._
    out.toSeq.toDF("step", "id", "cov_fp")
  }

  /** Driver-local farthest-point sampling for the LARGE-k regime —
    * the q179 (BPE driver-trainer) template applied to k-center:
    * [[kCenterGreedy]]'s per-round distributed scan is the right
    * shape while k is small (each round = one ≤k-vector broadcast +
    * one narrow max-dot scan + a 1-row TakeOrdered), but every round
    * is a full job wave, so at k = 10⁴ centers the scheduler — not
    * the arithmetic — dominates (measured: `tools/KcProbe`, ~3
    * rounds/s distributed vs ~10³+ rounds/s here). This variant
    * collects the candidate frame ONCE (`maxRows` loud guard — the
    * driverEdgeLimit pattern; at 100 TB run it per IVF cell or over a
    * pre-sampled residue, exactly like MMR's bounded rerank) and runs
    * classic incremental FPS: each round updates every point's
    * running max-coverage against only the NEWLY chosen center, so k
    * rounds cost O(n·k·d) arithmetic and zero job scheduling.
    *
    * EXACT-equal to [[kCenterGreedy]], spec-pinned: the same
    * fixed-point dot ([[graft.functions.FixedDot.roundAway]], the
    * native expression's own rounding) and the same (cov asc, id asc)
    * argmin — running-max over incremental updates equals the
    * distributed groupBy-max over all chosen centers. */
  def kCenterGreedyLocal(df: DataFrame, idCol: String, k: Int,
      seedId: Long, embCol: String = "embedding",
      maxRows: Long = 2000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long").as("id"),
      col(embCol).cast("array<float>").as("e"))
    val n = rows.count()
    require(n <= maxRows,
      s"kCenterGreedyLocal collects the candidate frame ($n rows > " +
        s"maxRows=$maxRows): pre-restrict the corpus (per-cell / " +
        "sampled residue) or use the distributed kCenterGreedy")
    val all = rows.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val idx = all.indexWhere(_._1 == seedId)
    require(idx >= 0 && all.count(_._1 == seedId) == 1,
      s"kCenterGreedyLocal: seed id $seedId absent (or duplicated)")
    def dot(a: Array[Float], b: Array[Float]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) {
        acc += graft.functions.FixedDot.roundAway(
          a(i).toDouble * b(i).toDouble * 1e12)
        i += 1
      }
      acc
    }
    val chosen = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)](
      (1, seedId, 0L))
    val taken = new Array[Boolean](all.length)
    taken(idx) = true
    val cov = new Array[Long](all.length)
    var j = 0
    while (j < all.length) {
      cov(j) = dot(all(j)._2, all(idx)._2); j += 1
    }
    var step = 2
    while (step <= k && step <= all.length) {
      // argmin (cov asc, id asc) over unchosen — `all` is id-sorted,
      // so the first strict improvement wins ties exactly like the
      // distributed orderBy
      var best = -1
      var i = 0
      while (i < all.length) {
        if (!taken(i) && (best < 0 || cov(i) < cov(best))) best = i
        i += 1
      }
      chosen += ((step, all(best)._1, cov(best)))
      taken(best) = true
      var m = 0
      while (m < all.length) {
        if (!taken(m)) {
          val d = dot(all(m)._2, all(best)._2)
          if (d > cov(m)) cov(m) = d
        }
        m += 1
      }
      step += 1
    }
    import spark.implicits._
    chosen.toSeq.toDF("step", "id", "cov_fp")
  }

  def bitextMine(src: DataFrame, tgt: DataFrame, srcIdCol: String,
      tgtIdCol: String, k: Int, thresholdFp: Long,
      embCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val fwd = knnJoinBrute(src, tgt, srcIdCol, tgtIdCol, k, embCol)
      .select(col("q_id").as("x"), col("c_id").as("y"),
        col("score_fp").as("s"))
    val bwd = knnJoinBrute(tgt, src, tgtIdCol, srcIdCol, k, embCol)
      .select(col("c_id").as("x"), col("q_id").as("y"),
        col("score_fp").as("s"))
    val sx = fwd.groupBy(col("x")).agg(sum(col("s")).as("sx"))
    val sy = bwd.groupBy(col("y")).agg(sum(col("s")).as("sy"))
    val cand = fwd.unionByName(bwd)
      .groupBy(col("x"), col("y")).agg(max(col("s")).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("x").orderBy(col("margin_fp").desc, col("y"))
    cand.join(sx, Seq("x")).join(sy, Seq("y"))
      .filter(col("sx") + col("sy") > 0)
      .withColumn("margin_fp", expr(
        s"""CAST((CAST(s AS DECIMAL(38,0)) * ${2L * k} * 1000000)
           | div (sx + sy) AS BIGINT)""".stripMargin))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("margin_fp") >= thresholdFp)
      .select(col("x").as("src_id"), col("y").as("tgt_id"),
        col("s").as("score_fp"), col("margin_fp"))
  }
}
