package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-center greedy semantics the q184 oracle can't isolate: the
  * farthest-point rule itself, tie order, duplicate handling, the
  * k > n degrade, and the seed guard. */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def pts() = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f)), // duplicate of the seed direction
    (3L, Array(0f, 1f, 0f)),
    (4L, Array(0f, 0f, 1f)))
    .toDF("vec_id", "embedding")

  test("farthest-point order: orthogonals first, the duplicate last") {
    val got = Similarity.kCenterGreedy(pts(), "vec_id", k = 4, seedId = 1L)
      .orderBy(col("step"))
      .select("step", "id", "cov_fp").as[(Int, Long, Long)].collect().toSeq
    // steps 2/3: cov 0 (orthogonal to everything chosen), tie by id;
    // step 4: the duplicate, coverage = the full 1e12 fixed-point dot
    assert(got == Seq((1, 1L, 0L), (2, 3L, 0L), (3, 4L, 0L),
      (4, 2L, 1000000000000L)), got.toString)
  }

  test("k beyond the point count stops at the point count") {
    val got = Similarity.kCenterGreedy(pts(), "vec_id", k = 50, seedId = 1L)
    assert(got.count() == 4)
  }

  test("absent seed rejects loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(pts(), "vec_id", k = 2, seedId = 99L)
    }
    assert(e.getMessage.contains("seed"), e.getMessage)
  }

  test("driver-local FPS is EXACT-equal to the distributed rounds") {
    // non-trivial geometry: 60 pseudo-random vectors (md5-derived so
    // the fixture is content-stable), full k — every round's argmin,
    // tie order, and fixed-point coverage must agree bit for bit
    val emb = spark.range(60).select(col("id"), expr(
      """transform(sequence(1, 16), j -> CAST(
        |  (CAST(conv(substring(md5(concat(CAST(id AS STRING), ':',
        |    CAST(j AS STRING))), 1, 6), 16, 10) AS DOUBLE)
        |    / 16777216.0 - 0.5) AS FLOAT))""".stripMargin)
      .as("embedding"))
    val dist = Similarity.kCenterGreedy(emb, "id", k = 60, seedId = 0L)
      .select("step", "id", "cov_fp").as[(Int, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val loc = Similarity
      .kCenterGreedyLocal(emb, "id", k = 60, seedId = 0L)
      .select("step", "id", "cov_fp").as[(Int, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(loc == dist)
    // the duplicate/tie fixture agrees too
    val locP = Similarity.kCenterGreedyLocal(pts(), "vec_id", 4, 1L)
      .select("step", "id", "cov_fp").as[(Int, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(locP == Seq((1, 1L, 0L), (2, 3L, 0L), (3, 4L, 0L),
      (4, 2L, 1000000000000L)))
    // the maxRows guard fails loudly before any collect
    val e = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedyLocal(emb, "id", 5, 0L, maxRows = 10L)
    }
    assert(e.getMessage.contains("maxRows"), e.getMessage)
  }
}
