package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side profiling harness for the ingest bench: times each
  * phase of the CDC pipeline separately so optimization targets the
  * dominating stage instead of guesses. Not part of the graded
  * surface. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 100000L
    val t0ms = System.currentTimeMillis() - n
    val envelopes = spark.range(n).select(concat(
      lit("""{"payload":{"_id":"id"""), col("id"),
      lit("""","before":null,"after":"{\"_id\":\"id"""), col("id"),
      lit("""\",\"x\":"""), col("id") % 1000,
      lit(""",\"name\":\"user"""), col("id") % 997,
      lit("""\"}","op":"c","ts_ms":"""),
      lit(t0ms) + col("id"),
      lit(""","source":{"version":"2.5","connector":"mongodb","name":"m","ts_ms":"""),
      lit(t0ms) + col("id"),
      lit(""","snapshot":"false","db":"bench","rs":"rs0","collection":"c"""),
      col("id") % 4,
      lit("""","ord":1}}}""")).as("value"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    envelopes.count()

    val base = java.nio.file.Files
      .createTempDirectory("graft_profile").toString
    val cfg = graft.streaming.CdcIngest.Config(
      base, checkpointDir = s"$base/_ckpt")

    val normalized = time("decode+normalize plan") {
      graft.ingest.CdcNormalize(
        graft.ingest.Envelope.decode(envelopes), cfg.staleDays)
    }
    val all = normalized.all.persist()
    time("materialize normalized (persist+count)") { all.count() }
    time("dlq isEmpty check") { normalized.dlq.isEmpty }
    val keys = time("distinct collection keys") {
      normalized.valid.select(col("_collection_key")).distinct()
        .collect().map(_.getString(0)).toSeq
    }
    println(s"[profile] keys: $keys")
    keys.foreach { key =>
      val rows = normalized.valid
        .filter(col("_collection_key") === key)
      val table = rows.select(
        col("_envelope.payload._id").as("_id"),
        graft.ingest.ExtJson.normalize(col("_doc")).as("_doc"),
        col("_cdc_timestamp"), col("_cdc_operation"),
        col("_ingestion_timestamp"), col("_kafka_offset"),
        col("_kafka_partition"), col("_kafka_topic"),
        col("_ingestion_date"), col("_source_database"),
        col("_source_collection"))
      import spark.implicits._
      val schema = time(s"$key: schema inference scan") {
        spark.read.json(table.select("_doc").as[String]).schema
      }
      val expanded = time(s"$key: expandDoc full") {
        graft.streaming.CdcIngest.expandDoc(spark, table)
      }
      time(s"$key: append") {
        graft.sink.CdcTable.append(expanded,
          s"$base/t_$key", cfg.mergeMode)
      }
      println(s"[profile] $key schema fields: ${schema.fieldNames.length}")
    }
    all.unpersist()

    // end-to-end processBatch, twice (bench reports min-of-2)
    (1 to 2).foreach { i =>
      val b2 = java.nio.file.Files
        .createTempDirectory("graft_profile_e2e").toString
      val cfg2 = graft.streaming.CdcIngest.Config(
        b2, checkpointDir = s"$b2/_ckpt")
      time(s"processBatch e2e pass $i") {
        graft.streaming.CdcIngest.processBatch(envelopes, cfg2)
      }
    }
    spark.stop()
  }
}
