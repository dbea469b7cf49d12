package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world"), (1L, "spark engine"), (2L, ""))
    .toDF("doc_id", "text")

  test("binary payload wrapping: schema + byte size metadata") {
    val m = Multimodal.asBinaryPayload(docs, "text", "text/plain")
    assert(m.schema("content").dataType == BinaryType)
    assert(m.schema("media_meta").dataType == Multimodal.metadataSchema)
    val sizes = m.select($"doc_id", $"media_meta.byte_size")
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 11L, 1L -> 12L, 2L -> 0L))
  }

  test("feature extraction runs partition-parallel and is deterministic") {
    val m = Multimodal.asBinaryPayload(docs, "text").repartition(3)
    val f = Multimodal.extractFeatures(m)
    assert(f.schema("features").dataType ==
      ArrayType(FloatType, containsNull = false))
    val rows = f.select($"doc_id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(rows(0L).length == Multimodal.featureDim)
    assert(rows(2L).forall(_ == 0.0f)) // empty payload → zero features
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(m)
      .select($"doc_id", $"features").as[(Long, Seq[Float])].collect().toMap
    assert(again == rows)
  }

  test("frame sampling and byte-budget repartitioning") {
    val m = Multimodal.asBinaryPayload(docs, "text")
    assert(Multimodal.sampleEveryN(m, "doc_id", 2)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
    val rp = Multimodal.repartitionByBytes(m, targetPartitionMB = 1)
    assert(rp.rdd.getNumPartitions == 1) // tiny payload → single partition
    assert(rp.count() == 3)
  }

  test("resize recomputes typed metadata alongside the byte transform") {
    val m = Multimodal.asBinaryPayload(docs, "text")
      // pretend the payloads are 4x2 'images'
      .withColumn("media_meta",
        org.apache.spark.sql.functions.struct(
          $"media_meta.media_type", $"media_meta.byte_size",
          org.apache.spark.sql.functions.lit(4).as("width"),
          org.apache.spark.sql.functions.lit(2).as("height"),
          $"media_meta.duration_ms"))
    val r = Multimodal.resizeTo(m, w = 2, h = 1)
    val rows = r.select("doc_id", "media_meta.width",
        "media_meta.height", "media_meta.byte_size", "content")
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getLong(3),
          x.getAs[Array[Byte]](4)))).toMap
    rows.values.foreach { case (w, h, size, bytes) =>
      assert(w == 2 && h == 1)
      assert(size == bytes.length,
        "byte_size metadata must match the transformed payload")
    }
    // 2x1 is a quarter of 4x2: "hello world" (11 bytes) → 11*2/8 = 2;
    // an empty source payload stays empty
    assert(rows(0L)._4.length == 2)
    assert(rows(2L)._4.length == 0)
  }

  test("resize upscale never overflows: payload is clamped, not wrapped") {
    // dimensionless payload (1x1 fallback) upscaled to 2048x2048:
    // keep = len * 2^22 overflows Int if narrowed before the clamp
    val m = Multimodal.asBinaryPayload(docs.filter($"doc_id" === 0L),
      "text")
    val r = Multimodal.resizeTo(m, w = 2048, h = 2048)
    val bytes = r.select("content").collect()(0).getAs[Array[Byte]](0)
    assert(bytes.length == "hello world".length,
      s"upscale keeps the full payload, got ${bytes.length}")
  }
}
