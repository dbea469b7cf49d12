package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass profiling: cell-level contract on a frame with nulls and
  * duplicates, and the single-scan plan shape. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile cells: counts, nulls, exact small distinct, min/max") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")),
      (5L, None)).toDF("id", "s").repartition(4)
    val got = Profile.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 5L, 0L, 5L, "1", "5")))
    assert(got("s") == (("s", 5L, 2L, 2L, "a", "b")))
  }

  test("profile is one aggregation: no join, no per-column scans") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val p = Profile.profile(docs,
        Seq("doc_id", "lang", "source"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "profiling must not join")
    assert(p.split("FileScan").length - 1 == 1,
      "all columns profile off ONE scan:\n" + p.take(600))
  }
}
