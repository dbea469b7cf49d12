package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "spark shuffles partitions across the cluster nodes")
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    // contains eval 4-gram "the quick brown fox" (and overlapping ones)
    (1L, "i saw the quick brown fox yesterday morning"),
    // contains "across the cluster nodes"
    (2L, "data moves across the cluster nodes at night"),
    // clean
    (3L, "completely unrelated text about cooking pasta slowly"),
    // shares only shorter fragments, no full 4-gram
    (4L, "the quick red fox sleeps")
  ).toDF("doc_id", "text")

  test("contaminated flags exactly the docs sharing a verbatim 4-gram") {
    val r = Decontaminate
      .contaminated(corpus, evalDocs, "text", "doc_id", n = 4)
      .as[(Long, Long)].collect().toMap
    // the only 4-gram present verbatim in both doc 1 and the eval set
    // is "the quick brown fox" ("quick brown fox jumps" is in eval but
    // doc 1 follows with "yesterday")
    assert(r(1L) == 1L, s"doc 1: $r")
    assert(r(2L) == 1L, s"doc 2: $r")
    assert(!r.contains(3L) && !r.contains(4L), s"clean docs flagged: $r")
  }

  test("bloom prefilter is planted in the plan and result stays exact") {
    val df = Decontaminate
      .contaminated(corpus, evalDocs, "text", "doc_id", n = 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe missing from plan:\n$plan")
    // fallback (no prefilter) must produce the identical result: the
    // bloom is a pure prefilter, false positives die in the verify join
    val evalSids = Decontaminate.withNgramSids(evalDocs, "text", 4)
      .select(explode(col("sids")).as("sid"))
      .distinct()
    val exact = Decontaminate.withNgramSids(corpus, "text", 4)
      .select(col("doc_id").as("id"), explode(col("sids")).as("sid"))
      .join(evalSids, Seq("sid"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
      .as[(Long, Long)].collect().toMap
    assert(df.as[(Long, Long)].collect().toMap == exact)
  }

  test("empty eval set yields no contamination and no bloom") {
    val r = Decontaminate.contaminated(corpus,
      evalDocs.filter(lit(false)), "text", "doc_id", n = 4)
    assert(r.count() == 0)
  }
}
