package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fixed-point log2 native: mirror equality, accuracy vs true
  * log2, monotonicity, and the null contract. */
class FixedLog2Spec extends SparkSpec {
  import spark.implicits._

  private val samples: Seq[Long] = {
    val rnd = new scala.util.Random(421)
    val edges = Seq(1L, 2L, 3L, (1L << 30) - 1, 1L << 30, (1L << 31) - 1,
      1L << 31, (1L << 62) - 1, 1L << 62, Long.MaxValue)
    val randoms = Seq.fill(500)(math.abs(rnd.nextLong()) max 1L)
    (edges ++ randoms).distinct
  }

  test("expression matches the driver-side mirror on the full range") {
    val got = samples.toDF("x")
      .withColumn("lg", expr("fixed_log2(x)"))
      .as[(Long, Long)].collect().toMap
    samples.foreach { x =>
      assert(got(x) == FixedPointMath.flog2(x), s"x=$x")
    }
  }

  test("accuracy: within 2^-15 of true log2 across the range") {
    samples.foreach { x =>
      val approx = FixedPointMath.flog2(x).toDouble / 65536.0
      val exact = math.log(x.toDouble) / math.log(2.0)
      assert(math.abs(approx - exact) < 3.2e-5,
        s"x=$x approx=$approx exact=$exact")
      assert(approx <= exact + 1e-12,
        s"truncation only ever undershoots: x=$x")
    }
  }

  test("monotone non-strict in x — the property bucketing needs") {
    val sorted = samples.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(FixedPointMath.flog2(a) <= FixedPointMath.flog2(b),
        s"a=$a b=$b")
    }
    // exact at powers of two
    (0 to 62).foreach { e =>
      assert(FixedPointMath.flog2(1L << e) == e.toLong << 16)
    }
  }

  test("null for non-positive input; null propagates") {
    val r = Seq(Some(0L), Some(-5L), Some(8L), None)
      .toDF("x").withColumn("lg", expr("fixed_log2(x)"))
      .select("lg").collect().map(r => Option(r.get(0)))
    assert(r(0).isEmpty && r(1).isEmpty && r(3).isEmpty)
    assert(r(2).contains(3L << 16))
  }
}
