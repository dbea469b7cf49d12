package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // tiny hand-checkable corpus of unit-ish vectors
  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by exact dot product") {
    val top = Similarity.cosineTopK(vecs, "vec_id", 0L, 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 4L))
  }

  test("nearDupPairs finds symmetric high-cosine pairs once") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", 0.85)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 >= p._2), "ordered pairs only")
  }

  test("lshBucket separates opposite vectors; ivfAssign picks nearest centroid") {
    val b = vecs.withColumn("bucket", Similarity.lshBucket())
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(b(0L) != b(3L), "antipodal vectors land in different buckets")
    val centroids = Seq((0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("cid", "ce")
    val assigned = Similarity.ivfAssign(vecs, centroids)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(assigned(0L) == 0L && assigned(1L) == 0L && assigned(2L) == 1L)
  }

  test("int8QuantStats: exact scale, bounded reconstruction error") {
    val df = Seq(
      (0L, Array(1.27f, -0.64f, 0.0f)),    // scale ≈ 0.01, all multiples
      (1L, Array(0.0f, 0.0f, 0.0f))        // degenerate all-zero
    ).toDF("vec_id", "embedding")
    val out = Similarity.int8QuantStats(df)
      .select("vec_id", "q_scale", "q_err")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // 1.27f is the float NEAREST 1.27, so the scale is ~0.01 to float
    // precision, not exactly 0.01
    assert(math.abs(out(0L)._1 - 0.01) < 1e-8, s"scale ${out(0L)._1}")
    // every element of vec 0 quantizes exactly (multiples of scale)
    assert(out(0L)._2 < 1e-6, s"err ${out(0L)._2}")
    assert(out(1L) == (0.0, 0.0), "zero vector: zero scale, zero err")
    // error is bounded by half a quantization step
    val rnd = (2L to 50L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 31 + j * 17) % 101 / 50.0 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.int8QuantStats(rnd)
      .select("q_scale", "q_err").as[(Double, Double)].collect()
      .foreach { case (s, e) =>
        assert(e <= s / 2 + 1e-7, s"err $e exceeds half-step ${s / 2}")
      }
  }

  test("retry: transient errors recover, schema conflicts fail fast") {
    var calls = 0
    val r = graft.streaming.Retry.withBackoff(maxAttempts = 3,
      baseMillis = 1) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("flaky")
      42
    }
    assert(r == 42 && calls == 3)
    var calls2 = 0
    assertThrows[graft.core.SchemaMerge.SchemaConflictException] {
      graft.streaming.Retry.withBackoff(maxAttempts = 5, baseMillis = 1) {
        calls2 += 1
        throw graft.core.SchemaMerge.SchemaConflictException("f",
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.BooleanType)
      }
    }
    assert(calls2 == 1, "non-retryable errors do not retry")
  }
}
