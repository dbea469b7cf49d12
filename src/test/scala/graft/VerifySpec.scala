package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** A throwing query must surface as an explicit error row in the Verify
  * artifact — never as absence (VERDICT r8 #2: that is exactly how a red
  * query hid behind an "84/84" headline). */
class VerifySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("a throwing query yields an error marker + _errors.json, not absence") {
    val out = tmpDir("verify-err")
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, d) => Tables(s, d, "region")),
      "broken_query" -> ((s, d) =>
        Tables(s, d, "region").selectExpr("no_such_column + 1")))
    val errors = Verify.run(spark, dir, out, queries)

    assert(errors.keySet == Set("broken_query"))
    // every query name has an artifact dir — the invariant the driver's
    // compare iterates over
    assert(Files.exists(Paths.get(s"$out/ok_query")))
    assert(Files.exists(Paths.get(s"$out/broken_query")))
    // the marker parquet is readable and self-describing
    val marker = spark.read.parquet(s"$out/broken_query")
    assert(marker.columns.toSeq == Seq("_verify_error"))
    assert(marker.head().getString(0).nonEmpty)
    // the sidecar names the query
    val sidecar = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(sidecar.contains("broken_query"))
    assert(!sidecar.contains("ok_query"))
  }

  test("an all-green run writes an empty _errors.json") {
    val out = tmpDir("verify-ok")
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, d) => Tables(s, d, "region")))
    val errors = Verify.run(spark, dir, out, queries)
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")) == "{}")
  }
}
