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
}
