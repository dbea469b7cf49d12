package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Envelope → normalized CDC record stream: operation classification,
  * document extraction, the 9 CDC metadata columns, routing key, and
  * the valid/DLQ split. All narrow per-row projections — no shuffle,
  * fully codegen'd — so the normalize stage streams at scan speed on
  * any cluster size.
  *
  * Column contract (reference `event_handler.py:168-214`,
  * `schema_inferrer.py:483-491`):
  * _cdc_timestamp, _cdc_operation, _ingestion_timestamp, _kafka_offset,
  * _kafka_partition, _kafka_topic, _ingestion_date, _source_database,
  * _source_collection.
  */
object CdcNormalize {

  /** DLQ reason taxonomy (reference `writer/dlq_writer.py:24-34`). */
  object DlqReason {
    val Corrupted = "corrupted_event"
    val UnknownOp = "unknown_operation"
    val MissingDocument = "missing_document"
    val MissingCollection = "missing_collection"
    val Oversized = "oversized_document"
    val Stale = "stale_event"
    val SchemaValidation = "schema_validation_error"
    val DeltaWrite = "delta_write_error"
    val MaxRetries = "max_retries_exceeded"
    /** A table CHECK constraint rejected the row ([[graft.sink
      * .CdcTable.addConstraint]]): the streaming ingest routes it
      * here instead of failing the stream — the reference's
      * dirty-data policy (spec.md:261-295) applied to the engine's
      * writer-side invariants. `error_detail` names the violated
      * constraints. */
    val ConstraintViolation = "constraint_violation"
  }

  /** `all` is the single flagged stream (with `_dlq_reason`); valid and
    * dlq are filters over it, so persisting `all` caches one plan and
    * one source read for both branches. */
  final case class Normalized(all: DataFrame) {
    def valid: DataFrame =
      all.filter(col("_dlq_reason").isNull).drop("_dlq_reason")
    def dlq: DataFrame = all.filter(col("_dlq_reason").isNotNull)
  }

  /** Max serialized document size (MongoDB's 16 MB limit; reference
    * spec.md FR-056 oversized policy). */
  val MaxDocBytes: Long = 16L * 1024 * 1024

  /** Normalize decoded envelopes (from [[Envelope.decode]]). Expects
    * Kafka-source columns `topic`, `partition`, `offset` when present;
    * synthesizes nulls otherwise (file/memory sources in tests).
    * Events older than `staleDays` relative to ingestion go to the DLQ
    * with reason `stale_event` (spec.md:211,302-305 — specified but
    * never implemented by the reference). */
  def apply(decoded: DataFrame, staleDays: Int = 7): Normalized = {
    val cols = decoded.columns.toSet
    val withKafka = Seq("topic" -> "string", "partition" -> "int",
      "offset" -> "long").foldLeft(decoded) { case (df, (c, t)) =>
      if (cols(c)) df else df.withColumn(c, lit(null).cast(t))
    }

    val enriched = withKafka
      .withColumn("_cdc_operation",
        Envelope.classifyOp(col("_envelope.payload.op")))
      // insert/update take `after` (fallback to before), delete takes
      // `before`, falling back to a key-only document synthesized from
      // the envelope _id (reference event_handler.py:126-166 falls back
      // to the message key the same way)
      .withColumn("_doc",
        when(col("_cdc_operation") === "delete",
          coalesce(col("_envelope.payload.before"),
            when(col("_envelope.payload._id").isNotNull,
              to_json(struct(col("_envelope.payload._id").as("_id"))))))
          .otherwise(coalesce(col("_envelope.payload.after"),
            col("_envelope.payload.before"))))
      .withColumn("_cdc_timestamp",
        timestamp_millis(coalesce(col("_envelope.payload.ts_ms"),
          col("_envelope.payload.source.ts_ms"))))
      .withColumn("_ingestion_timestamp", current_timestamp())
      .withColumn("_kafka_offset", col("offset"))
      .withColumn("_kafka_partition", col("partition"))
      .withColumn("_kafka_topic", col("topic"))
      .withColumn("_ingestion_date",
        date_format(current_date(), "yyyy-MM-dd"))
      .withColumn("_source_database", col("_envelope.payload.source.db"))
      .withColumn("_source_collection",
        col("_envelope.payload.source.collection"))
      // routing key db.collection (reference event_handler.py:216-237)
      .withColumn("_collection_key",
        concat_ws(".", col("_source_database"), col("_source_collection")))

    val reason =
      when(col("_envelope").isNull || col("_envelope.payload").isNull,
        DlqReason.Corrupted)
        .when(col("_cdc_operation").isNull, DlqReason.UnknownOp)
        .when(col("_doc").isNull, DlqReason.MissingDocument)
        .when(col("_source_collection").isNull ||
          col("_source_collection") === "", DlqReason.MissingCollection)
        .when(octet_length(col("_doc")) > MaxDocBytes, DlqReason.Oversized)
        .when(col("_cdc_timestamp") <
          current_timestamp() - expr(s"INTERVAL $staleDays DAYS"),
          DlqReason.Stale)
        .otherwise(lit(null).cast("string"))

    Normalized(enriched.withColumn("_dlq_reason", reason))
  }

  /** Sanitize `db.collection` into a table name `{db}_{collection}`
    * (reference event_consumer.py:232-247). */
  def tableName(collectionKey: String): String =
    collectionKey.replace('.', '_').replaceAll("[^A-Za-z0-9_]", "_")
}
