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

  /** Skew-AWARE salted inner equi-join: salts ONLY detected hot keys,
    * so the small side replicates `salts`× for the hot subset alone
    * instead of wholesale ([[saltedJoin]] measured 16.3 s at 100×
    * dimension size — almost all of it replication of keys that were
    * never skewed). Cold keys join exactly as a plain join (salt 0,
    * one small-side copy); hot-key rows scatter across `salts`
    * sub-partitions on the big side and meet an exploded small-side
    * replica set.
    *
    * Detection is two bounded jobs over the big side: a count and a
    * HAVING-filtered groupBy whose survivors (share ≥ `hotShare`,
    * capped at `maxHot` — by construction "a few pathological
    * values") collect to the driver as join-condition literals. Pass
    * `knownHot` to skip detection entirely (e.g. from a prior
    * [[keySkewReport]], or operational knowledge: NULL-ish defaults,
    * the empty-string user id). Result-invariant vs the plain join
    * for any key distribution — the q142 oracle proves it. */
  def saltedJoinSkewAware(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8, hotShare: Double = 0.001, maxHot: Int = 1000,
      knownHot: Option[Seq[Any]] = None): DataFrame = {
    require(salts > 0)
    require(hotShare > 0 && hotShare <= 1, s"hotShare in (0,1]: $hotShare")
    val hotKeys: Seq[Any] = knownHot.getOrElse {
      val total = big.count()
      val thresh = math.max(2L, math.ceil(total * hotShare).toLong)
      big.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= thresh)
        .orderBy(col("cnt").desc)
        .limit(maxHot)
        .select(col(key)).collect().map(_.get(0)).toSeq
    }
    if (hotKeys.isEmpty) return big.join(small, Seq(key))
    val isHot = col(key).isin(hotKeys: _*)
    val b = big.withColumn("_salt",
      when(isHot,
        pmod(xxhash64(monotonically_increasing_id()), lit(salts))
          .cast("long"))
        .otherwise(lit(0L)))
    val s = small.withColumn("_salt", explode(
      when(isHot, expr(s"sequence(0L, ${salts - 1}L)"))
        .otherwise(array(lit(0L)))))
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
