package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ExtJsonSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("j").select(ExtJson.normalize(col("j")).as("n"))
      .as[String].collect().head

  test("ObjectId wrapper → hex string") {
    assert(norm("""{"_id": {"$oid": "507f1f77bcf86cd799439011"}}""") ==
      """{"_id": "507f1f77bcf86cd799439011"}""")
  }

  test("$date millis and ISO forms") {
    assert(norm("""{"ts": {"$date": 1700000000000}}""") ==
      """{"ts": 1700000000000}""")
    assert(norm("""{"ts": {"$date": "2024-01-01T00:00:00Z"}}""") ==
      """{"ts": "2024-01-01T00:00:00Z"}""")
  }

  test("$numberLong/$numberInt/$numberDecimal unwrap to bare numbers") {
    assert(norm("""{"n": {"$numberLong": "-42"}}""") == """{"n": -42}""")
    assert(norm("""{"n": {"$numberInt": "7"}}""") == """{"n": 7}""")
    assert(norm("""{"d": {"$numberDecimal": "1.25"}}""") ==
      """{"d": 1.25}""")
  }

  test("$binary keeps base64 payload; nested docs untouched elsewhere") {
    assert(norm(
      """{"b": {"$binary": {"base64": "AQI=", "subType": "00"}}}""") ==
      """{"b": "AQI="}""")
    val nested = """{"a": {"x": 1, "oid": {"$oid": "aaaaaaaaaaaaaaaaaaaaaaaa"}}, "keep": {"y": 2}}"""
    assert(norm(nested) ==
      """{"a": {"x": 1, "oid": "aaaaaaaaaaaaaaaaaaaaaaaa"}, "keep": {"y": 2}}""")
  }
}
