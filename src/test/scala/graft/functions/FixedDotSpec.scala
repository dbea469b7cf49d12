package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedDotSpec extends SparkSpec {
  import spark.implicits._

  test("fixed_dot equals the portable built-in composition exactly") {
    val df = Seq(
      (Array(0.5f, -0.25f, 0.125f), Array(1.0f, 2.0f, -4.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(-0.1546943634748459f, 0.01411038264632225f, 0.9f),
        Array(0.3f, -0.7f, 0.111f))
    ).toDF("a", "b")
    val both = df.select(
      expr("fixed_dot(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b, (x, y) ->
        CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)),
        0L, (acc, v) -> acc + v)""").as("composed"))
    assert(both.filter($"native" =!= $"composed").count() == 0)
  }

  test("fixed_dot survives whole-stage codegen and null inputs") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f)), None)
    ).toDF("a", "b")
    val out = df.select(expr("fixed_dot(a, b)").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).contains(11L * 1000L * 1000L * 1000L * 1000L))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("null array element nulls the result, matching zip_with") {
    val df = spark.sql(
      """SELECT array(cast(1.0 as float), cast(null as float)) AS a,
        |       array(cast(2.0 as float), cast(3.0 as float)) AS b""".stripMargin)
    val r = df.select(
      expr("fixed_dot(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b, (x, y) ->
        CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)),
        0L, (acc, v) -> acc + v)""").as("composed")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("rounding is half away from zero on both signs") {
    assert(FixedDot.roundAway(2.5) == 3L)
    assert(FixedDot.roundAway(-2.5) == -3L)
    assert(FixedDot.roundAway(2.4) == 2L)
    assert(FixedDot.roundAway(-2.4) == -2L)
  }
}
