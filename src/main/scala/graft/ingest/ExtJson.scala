package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MongoDB extended-JSON normalization (reference
  * `delta-writer/src/transformers/bson_to_delta.py:24-84` — the BSON
  * scalar mapping of SURVEY.md §1.2, operating on the wire format
  * Debezium actually emits, which wraps BSON scalars as
  * `{"$oid": …}`, `{"$date": …}`, `{"$numberLong": "…"}`,
  * `{"$numberDecimal": "…"}`, `{"$binary": {"base64": …}}`).
  *
  * Applied to the raw document JSON string BEFORE schema inference,
  * these rewrites turn the wrappers into plain scalars so the inferred
  * schema gets `string`/`long`/`double` instead of nested
  * `$oid`-structs:
  *
  *   ObjectId   → hex string        (bson_to_delta.py:43-44)
  *   $date (ms) → epoch-ms long     (timestamp_millis downstream)
  *   $numberLong/$numberInt → bare number
  *   $numberDecimal → bare number   (reference: decimal128(38,10))
  *   $binary    → base64 payload string (bson_to_delta.py:50-52)
  *
  * Pure regexp_replace chain — codegen'd, shuffle-free, safe on
  * arbitrarily nested documents since the wrappers are syntactically
  * unambiguous. */
object ExtJson {

  private val rewrites: Seq[(String, String)] = Seq(
    // {"$oid": "abc"} → "abc"
    ("""\{\s*"\$oid"\s*:\s*("[0-9a-fA-F]{24}")\s*\}""", "$1"),
    // {"$date": 1700000000000} → 1700000000000
    ("""\{\s*"\$date"\s*:\s*(-?\d+)\s*\}""", "$1"),
    // {"$date": "2024-01-01T00:00:00Z"} → "2024-01-01T00:00:00Z"
    ("""\{\s*"\$date"\s*:\s*("[^"]*")\s*\}""", "$1"),
    // {"$numberLong": "42"} / {"$numberInt": "42"} → 42
    ("""\{\s*"\$number(?:Long|Int)"\s*:\s*"(-?\d+)"\s*\}""", "$1"),
    // {"$numberDecimal": "1.25"} → 1.25
    ("""\{\s*"\$numberDecimal"\s*:\s*"(-?[0-9.eE+]+)"\s*\}""", "$1"),
    // {"$binary": {"base64": "AQI=", "subType": "00"}} → "AQI="
    ("""\{\s*"\$binary"\s*:\s*\{\s*"base64"\s*:\s*("[^"]*")[^}]*\}\s*\}""",
      "$1"))

  /** Normalize extended-JSON wrappers inside a JSON-string column. */
  def normalize(doc: Column): Column =
    rewrites.foldLeft(doc) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
}
