package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium MongoDB change-event envelope: schema + decode.
  *
  * Canonical shape per the reference's contract fixtures
  * (`tests/contract/test_debezium_events.py:17-134`, FIXTURES.md §1):
  * payload.{_id, before, after, op, ts_ms, source{db, collection, …}}.
  * The document payloads (`after`/`before`) stay STRING here — their
  * schema is collection-specific and inferred downstream (schema-on-
  * read with `schema_of_json`/`from_json` per collection), matching
  * the reference's per-batch inference (`schema_inferrer.py:93-125`).
  */
object Envelope {

  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("rs", StringType),
    StructField("collection", StringType),
    StructField("ord", IntegerType)))

  /** payload of the envelope; after/before kept as raw JSON strings. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("source", sourceSchema)))

  val schema: StructType = StructType(Seq(
    StructField("payload", payloadSchema)))

  /** Decode a raw JSON `value` column (Kafka message body) into the
    * envelope struct. Malformed JSON yields a null payload, which the
    * normalizer routes to the DLQ (reference `event_handler.py:47-60`
    * decode + corrupted-event branch). */
  def decode(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.withColumn("_envelope",
      from_json(col(valueCol).cast("string"), schema))

  /** Operation classifier: c/r → insert, u → update, d → delete,
    * anything else null (dropped / DLQ'd downstream). Reference
    * `consumer/event_handler.py:102-124`. */
  def classifyOp(op: Column): Column =
    when(op.isin("c", "r"), "insert")
      .when(op === "u", "update")
      .when(op === "d", "delete")
      .otherwise(lit(null).cast("string"))
}
