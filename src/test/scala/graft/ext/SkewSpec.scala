package graft.ext

import graft.SparkSpec
import graft.sink.CdcTable
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of big-side rows share one hot key
    val big = spark.range(0, 10000)
      .withColumn("k", when($"id" % 10 < 9, 0L).otherwise($"id" % 100))
      .withColumn("v", $"id" * 2)
    val small = spark.range(0, 100).toDF("k")
      .withColumn("name", concat(lit("n"), $"k"))
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum($"v")).collect()(0).getLong(0) ==
      plain.agg(sum($"v")).collect()(0).getLong(0))
  }

  test("skew report surfaces the hot key") {
    val df = spark.range(0, 1000)
      .withColumn("k", when($"id" % 5 < 4, 7L).otherwise($"id"))
    val top = Skew.keySkewReport(df, "k", 1).collect()(0)
    assert(top.getLong(0) == 7L && top.getDouble(2) > 0.7)
  }
}
