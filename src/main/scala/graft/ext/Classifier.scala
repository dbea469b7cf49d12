package graft.ext

import java.math.BigInteger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the DISCRIMINATIVE curation tool next
  * to DSIR's generative importance weights ([[TextAnalysis]]): a
  * linear probe over hashed word-bigram presence features, fit by
  * full-batch gradient descent on squared loss against a binary
  * "looks like the reference corpus" label (the fastText-style
  * quality filter of the GPT-3 / LLaMA data pipelines, reduced to its
  * deterministic linear core — no RNG, no floating point).
  *
  * Everything is exact fixed-point integer arithmetic (weights at
  * scale 1e6), the learning rate is the data-derived safe step
  * 1/(n·L) with L = the largest per-document feature count (so
  * ‖X‖²≤n·L bounds the quadratic-loss curvature and the iteration
  * can never diverge), and division truncates toward zero on both
  * engines — so the trained model is bit-identical between Spark and
  * a SQL replay that unrolls the iterations as chained CTEs (the same
  * oracle move as the BPE trainer).
  *
  * Scale shape (the 100 TB lens): the (id, fid) presence-pair frame is
  * built once, hash-partitioned by id and persisted; each iteration is
  * then ONE bounded-output shuffle (the per-feature gradient sum — at
  * most `buckets`+1 rows) plus partition-local margin sums (the
  * broadcast weight join and the per-id aggregations reuse the pinned
  * partitioning). Model state is ≤ `buckets`+1 rows — driver-held
  * between iterations like the BPE trainer's per-round argmax, never
  * corpus-sized. Reference anchor: the reference curates documents
  * with per-doc validity/quality rules
  * (delta-writer/src/utils/validation.py); this is the trainable
  * generalization a 100 TB pretraining pipeline uses.
  */
object Classifier {

  private val Scale = 1000000L

  /** Truncate-toward-zero division — pinned explicitly because Spark's
    * `div` and DuckDB's `//` must agree on NEGATIVE gradients. */
  private def tdiv(g: BigInteger, d: Long): Long = {
    // BigInteger.divide truncates toward zero, matching the oracle's
    // CASE WHEN g >= 0 THEN g // d ELSE -((-g) // d) END.
    g.divide(BigInteger.valueOf(d)).longValueExact()
  }

  /** Distinct presence features per document: the hashed-bigram ids of
    * [[TextAnalysis]] (bit-portable md5-prefix hash) deduplicated per
    * doc, plus one bias feature `fid = buckets` per document (so every
    * document — even a bigram-less one — has at least one feature and
    * the model can learn a base rate). */
  private[ext] def presenceFeatures(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__text"))
    // Per-doc presence is ARRAY-LOCAL dedup: array_distinct over the
    // doc's own bigram ids replaces the former corpus-wide
    // `.distinct()` (a full (id, fid) shuffle), and appending the
    // bias feature to the same array replaces the former
    // `.union(base)` second scan — one scan, zero shuffles, the same
    // (id, fid) set.
    val fids =
      if (df.sparkSession.catalog.functionExists("lm_feature_ids"))
        expr(s"array_distinct(transform(" +
          s"lm_feature_ids(__text, $buckets), p -> p.bfid))")
      else expr(
        s"""array_distinct(transform(
           |  CASE WHEN size(split(trim(__text), '\\\\s+')) >= 2 THEN
           |    sequence(0, size(split(trim(__text), '\\\\s+')) - 2)
           |  ELSE CAST(array() AS ARRAY<INT>) END,
           |  i -> CAST(conv(substring(md5(concat(
           |      split(trim(__text), '\\\\s+')[i], ' ',
           |      split(trim(__text), '\\\\s+')[i+1])), 1, 7), 16, 10)
           |    AS BIGINT) % $buckets))""".stripMargin)
    base.select(col("id"),
      explode(concat(
        coalesce(fids, expr("CAST(array() AS ARRAY<BIGINT>)")),
        array(lit(buckets.toLong)))).as("fid"))
  }

  /** Fit the linear probe: returns the (fid, w) weight table (w at
    * scale 1e6, zero-weight rows dropped — absent means 0). Persist it
    * and apply anywhere with [[score]] /
    * [[classifierFilterStreamToTable]]; `buckets` is part of the
    * model and must match at apply time.
    *
    * y = 1e6 for `isTarget` rows, 0 otherwise; `iters` full-batch GD
    * steps w ← w + (Xᵀ(y − Xw)) / (n·L), all integer. `idCol` values
    * must be unique — a duplicated id would double-count its bias
    * feature in the margins. */
  def train(df: DataFrame, idCol: String, isTarget: Column,
      textCol: String = "text", buckets: Int = 65536,
      iters: Int = 3): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = df.sparkSession
    import spark.implicits._

    val feats = presenceFeatures(df, idCol, textCol, buckets)
      .repartition(col("id")).persist()
    val labels = df.select(col(idCol).cast("long").as("id"),
        when(isTarget, lit(Scale)).otherwise(lit(0L)).as("y_fp"))
      .repartition(col("id")).persist()
    try {
      // one job for both scalars: every doc has a bias feature and
      // ids are unique (the documented contract), so the per-id
      // count frame has exactly one row per input row
      val nl = feats.groupBy("id").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n"), max("c").as("l")).head
      val n = nl.getLong(0)
      require(n > 0, "classifier training corpus is empty")
      val lMax = nl.getLong(1)
      val denom = Math.multiplyExact(n, lMax)

      // Driver-held model (≤ buckets+1 entries), like the BPE
      // trainer's per-round state: bounded by the hash space, never
      // by the corpus.
      var w = Map.empty[Long, Long]
      for (_ <- 1 to iters) {
        val resid =
          if (w.isEmpty) labels.select(col("id"), col("y_fp").as("r"))
          else {
            val wDf = w.toSeq.toDF("fid", "w")
            val margins = feats
              .join(broadcast(wDf), Seq("fid"), "left")
              .groupBy("id")
              .agg(sum(coalesce(col("w"), lit(0L))).as("m"))
            labels.join(margins, Seq("id"), "left")
              .select(col("id"),
                (col("y_fp") - coalesce(col("m"), lit(0L))).as("r"))
          }
        val grad = feats.join(resid, Seq("id"))
          .groupBy("fid")
          .agg(sum(col("r").cast("decimal(38,0)")).as("g"))
          .collect()
        w = grad.iterator.map { row =>
          val fid = row.getLong(0)
          val g = row.getDecimal(1).toBigInteger
          fid -> (w.getOrElse(fid, 0L) + tdiv(g, denom))
        }.filter(_._2 != 0L).toMap
      }
      w.toSeq.toDF("fid", "w")
    } finally {
      feats.unpersist()
      labels.unpersist()
    }
  }

  /** Score a corpus under a trained (fid, w) table: (id, n_feats,
    * score_fp) for EVERY input row — score_fp is the fixed-point
    * margin Σ w[f] over the doc's distinct features (+ bias), unseen
    * features contribute 0. The weight table broadcasts; the only
    * corpus shuffle is the per-doc sum. */
  def score(df: DataFrame, idCol: String, weights: DataFrame,
      textCol: String = "text", buckets: Int = 65536): DataFrame = {
    val sc = presenceFeatures(df, idCol, textCol, buckets)
      .join(broadcast(weights.select(col("fid"), col("w"))),
        Seq("fid"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w"), lit(0L))).as("score_fp"))
    df.select(col(idCol).cast("long").as("id"))
      .join(sc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
  }

  /** Streaming quality gate: every micro-batch scored against a
    * pre-trained weight table (re-read per trigger so an offline
    * re-fit is picked up live) and filtered by an ABSOLUTE fixed-point
    * margin cutoff — corpus-relative cuts (top fraction, percentile)
    * do not exist on a stream, same argument as the perplexity gate's
    * absolute bits-per-token cutoff. Kept rows append exactly-once
    * (batch-id-keyed txns; acceptance is a pure function of the text,
    * so a crash replay keeps the SAME rows). */
  def classifierFilterStreamToTable(stream: DataFrame, idCol: String,
      textCol: String, weights: () => DataFrame, minScoreFp: Long,
      outDir: String, checkpointDir: String,
      appId: String = "graft-clf", buckets: Int = 65536)
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val kept = score(batch, idCol, weights(), textCol, buckets)
          .filter(col("score_fp") >= minScoreFp)
        graft.sink.CdcTable.append(
          batch.join(kept.select(col("id").as(idCol)),
            Seq(idCol), "left_semi"),
          outDir, txn = Some((appId, id)))
        ()
      }
      .start()
}
