package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for large joins (SURVEY.md §4 / the 100 TB
  * design notes): AQE's skew-join split handles sort-merge skew
  * automatically, but a join key with a few pathological hot values
  * (the classic null-key / default-value skew in CDC data) still
  * serializes on one task. Salting replicates the small side R times
  * and scatters the big side's hot keys across R sub-partitions.
  */
object Skew {

  /** Salted inner equi-join: `big ⋈ small` on `key`, with the big
    * side's rows salted uniformly and the small side exploded across
    * all `salts` replicas. Correct for any key distribution; costs
    * `salts`× the small side (keep it the dimension side). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val b = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val s = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Report the heaviest `topK` join-key values with counts and the
    * share of total rows — the diagnostic before deciding to salt. */
  def keySkewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .withColumn("share", col("cnt") / lit(total.toDouble))
      .orderBy(col("cnt").desc)
      .limit(topK)
  }
}
