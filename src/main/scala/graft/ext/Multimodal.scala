package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs partition-parallel over Arrow-sized batches
  * via mapPartitions (the JVM analogue of mapInPandas — same batch
  * shape, same schema contract).
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives a deterministic fake feature
  * vector from the bytes. The Spark-side plumbing — schema, binary
  * transport, per-partition batching, output contract — is real and
  * tested; swapping the stub for a JNI/ONNX decoder changes one
  * function.
  *
  * Scale notes: binary payloads make rows wide, so the pipeline keeps
  * them in their own column (never inside structs that defeat column
  * pruning), samples frames BEFORE shuffling, and repartitions by
  * byte-budget not row count.
  */
object Multimodal {

  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_size", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a string column as a multimodal binary payload + metadata
    * (used by tests to fabricate media rows from `documents`). */
  def asBinaryPayload(df: DataFrame, contentCol: String,
      mediaType: String = "application/octet-stream"): DataFrame =
    df.withColumn("content", encode(col(contentCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        octet_length(col("content")).cast("long").as("byte_size"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
        .cast(metadataSchema)) // align nullability with the contract

  val featureDim = 8

  /** STUB decode: ??? in production — replace with the real codec.
    * Here: deterministic fake features (byte histogram moments) so the
    * pipeline is testable end-to-end. Runs per-partition over the
    * binary column with zero driver involvement. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // ??? real implementation would decode the media container here
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % featureDim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < featureDim) { out(j) /= bytes.length; j += 1 }
    }
    out
  }

  /** Feature-extract the `content` binary column into a
    * `features: array<float>` column via partition-parallel batches
    * (mapPartitions ≈ mapInPandas batch shape). */
  def extractFeatures(df: DataFrame,
      contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    val res: Dataset[Row] = df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeStub(bytes).toSeq)
      }
    }(enc)
    res
  }

  /** STUB resize: ??? in production — a real implementation re-encodes
    * the media at (w, h). Here: deterministic byte truncation
    * proportional to the pixel-count ratio, so the PLUMBING —
    * metadata recompute, partition-parallel batch shape, byte-size
    * contract — is real and testable. */
  def resizeStub(bytes: Array[Byte], srcW: Int, srcH: Int,
      w: Int, h: Int): Array[Byte] = {
    // ??? real implementation would decode + rescale + re-encode
    val srcPx = math.max(1L, srcW.toLong * srcH)
    val keep = math.max(1L,
      bytes.length.toLong * (w.toLong * h) / srcPx)
    // clamp in LONG before narrowing: an upscale can push `keep` past
    // Int.MaxValue, and keep.toInt would wrap to 0/negative (empty
    // payload or NegativeArraySizeException)
    java.util.Arrays.copyOf(bytes,
      math.min(bytes.length.toLong, keep).toInt)
  }

  /** Resize the `content` binary column to (w, h), recomputing the
    * typed metadata struct (width/height/byte_size) in the same
    * partition-parallel pass — the mapInPandas batch shape with zero
    * driver involvement. Source dimensions default to the metadata
    * values (fallback 1×1 for dimensionless payloads). */
  def resizeTo(df: DataFrame, w: Int, h: Int,
      contentCol: String = "content",
      metaCol: String = "media_meta"): DataFrame = {
    val enc = Encoders.row(df.schema)
    val cIdx = df.schema.fieldIndex(contentCol)
    val mIdx = df.schema.fieldIndex(metaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        val meta = r.getStruct(mIdx)
        val srcW = if (meta.isNullAt(2)) 1 else meta.getInt(2)
        val srcH = if (meta.isNullAt(3)) 1 else meta.getInt(3)
        val out = resizeStub(bytes, srcW, srcH, w, h)
        val newMeta = Row(meta.get(0), out.length.toLong,
          w, h, meta.get(4))
        Row.fromSeq(r.toSeq.updated(cIdx, out).updated(mIdx, newMeta))
      }
    }(enc)
  }

  /** Frame sampling: keep every `everyN`-th unit (deterministic on a
    * key column) BEFORE any shuffle — the bandwidth saver at 100 TB. */
  def sampleEveryN(df: DataFrame, keyCol: String, everyN: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(everyN)) === 0)

  /** Re-balance by byte budget: binary rows are wildly skewed in size,
    * so partition count derives from total payload bytes. */
  def repartitionByBytes(df: DataFrame, targetPartitionMB: Int = 256,
      byteSizeCol: String = "media_meta.byte_size"): DataFrame = {
    val total = df.agg(sum(col(byteSizeCol))).collect()(0).getLong(0)
    val n = math.max(1,
      (total / (targetPartitionMB.toLong * 1024 * 1024)).toInt)
    df.repartition(n)
  }
}
