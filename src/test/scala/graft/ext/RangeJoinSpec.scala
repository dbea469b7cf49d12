package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned join equals the naive theta join at every bin width") {
    val rnd = new scala.util.Random(11)
    val points = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(10000).toLong)).toDF("pid", "ts")
    val intervals = (0 until 40).map { i =>
      val lo = rnd.nextInt(9500).toLong
      (100L + i, lo, lo + 1 + rnd.nextInt(800).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(intervals,
        col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (bin <- Seq(1L, 7L, 256L, 1000L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          "ts", "lo", "hi", bin)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"bin=$bin: no duplicate pairs")
      assert(got.toSet == naive, s"bin=$bin")
    }
    // empty and boundary intervals: [5,5) matches nothing, ts=hi is out
    val edge = RangeJoin.pointInInterval(
      Seq((1L, 5L)).toDF("pid", "ts"),
      Seq((10L, 5L, 5L), (11L, 0L, 5L), (12L, 5L, 6L))
        .toDF("iid", "lo", "hi"),
      "ts", "lo", "hi", 4L)
      .select("iid").as[Long].collect().toSet
    assert(edge == Set(12L), "half-open semantics")
  }

  test("intervalOverlap equals the naive theta self-join, no dup pairs") {
    val rnd = new scala.util.Random(17)
    val iv = (0 until 120).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(900).toLong)
    }.toDF("id", "lo", "hi")
    val naive = iv.select(col("id").as("a_id"), col("lo").as("a_lo"),
        col("hi").as("a_hi"))
      .join(iv.select(col("id").as("b_id"), col("lo").as("b_lo"),
        col("hi").as("b_hi")),
        col("a_id") < col("b_id") && col("a_lo") < col("b_hi") &&
          col("b_lo") < col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (bin <- Seq(64L, 500L, 1024L, 10000L)) {
      val got = RangeJoin.intervalOverlap(iv, "id", "lo", "hi", bin)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size,
        s"bin=$bin: the max(lo)-bin rule keeps each pair exactly once")
      assert(got.toSet == naive, s"bin=$bin")
    }
    // touching-but-not-overlapping half-open intervals never pair
    val touch = RangeJoin.intervalOverlap(
        Seq((1L, 0L, 10L), (2L, 10L, 20L)).toDF("id", "lo", "hi"),
        "id", "lo", "hi", 8L)
      .count()
    assert(touch == 0, "[0,10) and [10,20) do not overlap")
  }

  test("the plan is a hash equi-join on the bin, never a nested loop") {
    val points = (0 until 50).map(i => (i.toLong, i.toLong * 3))
      .toDF("pid", "ts")
    val intervals = Seq((1L, 10L, 40L), (2L, 90L, 120L))
      .toDF("iid", "lo", "hi")
    val p = RangeJoin.pointInInterval(points, intervals,
      "ts", "lo", "hi", 32L).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "binning must manufacture an equi-key")
    assert(!p.contains("CartesianProduct"), p.take(400))
  }
}
