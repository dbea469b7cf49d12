package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned point-in-interval join — the UNKEYED range join Spark has
  * no physical operator for: `points.join(intervals, ts >= lo && ts <
  * hi)` has no equi-key, so Catalyst falls back to
  * BroadcastNestedLoopJoin (every point × every interval — the plan
  * that dies first at scale). Binning manufactures the equi-key: each
  * interval explodes to the time bins it covers, each point computes
  * its one bin, and the join is a plain hash equi-join on the bin
  * followed by the exact containment filter. A (point, interval)
  * pair can only meet in the point's single bin, so no dedup pass is
  * needed.
  *
  * The keyed variant (same key + time range) is
  * [[graft.streaming.StreamOps.intervalJoin]]; this is the pure-range
  * shape (alerting windows, maintenance blackouts, session overlap
  * audits).
  *
  * Scale shape: interval fan-out is ceil(len/binWidth)+1 rows —
  * choose `binWidth` near the TYPICAL interval length so the fan-out
  * is ~2× and a point's bin holds ~the intervals that could contain
  * it. Both sides shuffle once, keyed on the bin; a pathologically
  * long interval fans out linearly in its length (cap or split such
  * intervals upstream). Timestamps must be NON-NEGATIVE integers
  * (epoch micros; `div` truncation = floor only on the nonneg
  * domain). Column sets must be disjoint. */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pTsCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0: $binWidth")
    val iv = intervals
      .filter(col(hiCol) > col(loCol)) // empty intervals match nothing
      .withColumn("__bin", explode(expr(
        s"sequence(`$loCol` div ${binWidth}L, " +
          s"(`$hiCol` - 1) div ${binWidth}L)")))
    points
      .withColumn("__bin", expr(s"`$pTsCol` div ${binWidth}L"))
      .join(iv, Seq("__bin"))
      .filter(col(pTsCol) >= col(loCol) && col(pTsCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP self-join, binned: unordered pairs (a, b) with
    * a.id < b.id whose half-open spans intersect (lo_a < hi_b AND
    * lo_b < hi_a). Both sides explode to their covered bins, so an
    * overlapping pair CO-OCCURS in every bin their spans share — the
    * classic dedup-free trick keeps exactly one copy: a pair is
    * emitted only in the bin of max(lo_a, lo_b) (the later start,
    * which every overlapping pair's shared span contains). Returns
    * (a_id, a_lo, a_hi, b_id, b_lo, b_hi). Same binWidth guidance and
    * nonneg-domain contract as [[pointInInterval]]. */
  def intervalOverlap(intervals: DataFrame, idCol: String,
      loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0: $binWidth")
    def side(p: String): DataFrame = intervals
      .select(col(idCol).cast("long").as(s"${p}_id"),
        col(loCol).as(s"${p}_lo"), col(hiCol).as(s"${p}_hi"))
      .filter(col(s"${p}_hi") > col(s"${p}_lo"))
      .withColumn("__bin", explode(expr(
        s"sequence(${p}_lo div ${binWidth}L, " +
          s"(${p}_hi - 1) div ${binWidth}L)")))
    side("a").join(side("b"),
        Seq("__bin"))
      .filter(col("a_id") < col("b_id") &&
        col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi") &&
        col("__bin") ===
          expr(s"greatest(a_lo, b_lo) div ${binWidth}L"))
      .drop("__bin")
  }
}
