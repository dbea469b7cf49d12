package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR re-ranking semantics the q181 oracle can't isolate: the
  * diversification trade itself (a redundant high-relevance hit loses
  * to a diverse lower-relevance one), the λ extremes, the k > n
  * degrade, and the candidate-bound guard. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // unit vectors chosen so pairwise cosines are exactly 0 or 1:
  // ids 1 and 2 are IDENTICAL directions, 3 and 4 orthogonal ones
  private def cand() = Seq(
    (1L, Array(1f, 0f, 0f), 900L),
    (2L, Array(1f, 0f, 0f), 850L),
    (3L, Array(0f, 1f, 0f), 500L),
    (4L, Array(0f, 0f, 1f), 400L))
    .toDF("id", "embedding", "rel_fp")

  private def picks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.orderBy(col("step")).select("id").as[Long].collect().toSeq

  test("diversification: a near-duplicate of the top hit is deferred") {
    // λ=0.7: after id 1, id 2 scores 7·850 − 3·1e12 (sim 1.0) —
    // crushed; ids 3 and 4 (orthogonal, sim 0) win steps 2 and 3
    val got = Similarity.mmrRerank(cand(), k = 4, lambdaTenths = 7)
    assert(picks(got) == Seq(1L, 3L, 4L, 2L), got.collect().toSeq.toString)
    // step 1 is pure relevance; its max_sim_fp is 0 by definition
    val r1 = got.filter(col("step") === 1).head()
    assert(r1.getLong(3) == 0L && r1.getLong(4) == 7 * 900L)
  }

  test("λ = 1.0 degrades to pure relevance order") {
    val got = Similarity.mmrRerank(cand(), k = 4, lambdaTenths = 10)
    assert(picks(got) == Seq(1L, 2L, 3L, 4L), picks(got).toString)
  }

  test("k beyond the candidate count returns every candidate once") {
    val got = Similarity.mmrRerank(cand(), k = 99)
    assert(picks(got).sorted == Seq(1L, 2L, 3L, 4L))
    assert(got.count() == 4)
  }

  test("candidate lists above maxCandidates reject loudly") {
    val big = spark.range(10).select(col("id"),
      expr("array(CAST(1.0 AS FLOAT))").as("embedding"),
      col("id").as("rel_fp"))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(big, k = 3, maxCandidates = 5)
    }
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
  }
}
