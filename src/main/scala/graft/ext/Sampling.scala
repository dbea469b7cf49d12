package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sequence packing — the
  * training-data plumbing next to dedup/quality (SURVEY.md §2 north
  * star): train/val/test assignment must be STABLE across runs,
  * engines and cluster sizes (re-sampling a 100 TB corpus because
  * `rand()` reseeded is not an option), so both ops derive everything
  * from content hashes / orderings, never from RNG or partition ids.
  * Both are single-pass: the split is a per-row projection
  * (scan-speed), the packing one window aggregation per group key.
  */
object Sampling {

  /** Stable bucket in [0, m) from a key column: md5-prefix hash (28
    * bits), portable bit-for-bit across engines (the same trick as the
    * dedup token ids — xxhash64 differs between engines). */
  def stableBucket(keyCol: String, m: Int): Column =
    expr("CAST(conv(substring(md5(CAST(`" + keyCol +
      "` AS STRING)), 1, 7), 16, 10) AS BIGINT)") % m

  /** Deterministic train/val/test assignment: adds `bucket` (0-99)
    * and `split`. A document's split never changes when the corpus
    * grows or the job re-runs — it is a pure function of the key. */
  def hashSplit(df: DataFrame, keyCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    df.withColumn("bucket", stableBucket(keyCol, 100))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Concatenation-order sequence packing (the pretraining "pack
    * documents into fixed token windows" op): documents are laid out
    * per `groupCol` in `orderCol` order and chunked every `budget`
    * tokens; a document belongs to the pack where it STARTS (GPT-style
    * packing splits documents across boundaries — the pack id of the
    * start is the deterministic assignment). Adds `cum_before` (tokens
    * preceding the document in its group) and `pack_id`.
    *
    * One window aggregation per group — at scale the shuffle is keyed
    * by `groupCol`, so group count bounds parallelism; pack corpora
    * under a composite group key (e.g. source, shard) to keep groups
    * bounded. The division goes through an exact double (token totals
    * ≪ 2^53), identical in every engine. */
  def sequencePack(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    df.withColumn("cum_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)).cast("long"))
      .withColumn("pack_id",
        floor(col("cum_before").cast("double") / budget).cast("long"))
  }
}
