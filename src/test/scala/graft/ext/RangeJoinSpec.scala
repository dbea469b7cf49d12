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
