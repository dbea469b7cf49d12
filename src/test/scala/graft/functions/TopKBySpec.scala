package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The k-bounded top-k aggregate: bit-equality with the window-rank
  * composition it replaces, determinism under repartitioning (partial
  * merges in arbitrary order), tie-breaking, and the bounded-state
  * serialization roundtrip. */
class TopKBySpec extends SparkSpec {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(expr(s"topk_by(s, id, $k)").as("tk"))
      .select($"g", posexplode($"tk").as(Seq("p", "e")))
      .select($"g", ($"p" + 1).as("rnk"), $"e.id", $"e.score")
      .as[(Long, Int, Long, Long)].collect().toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy($"s".desc, $"id")
    df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"g", $"rnk", $"id", $"s")
      .as[(Long, Int, Long, Long)].collect().toSet
  }

  test("matches ROW_NUMBER window on random groups across partitions") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextLong() % 1000, i.toLong)
    }
    val df = rows.toDF("g", "s", "id").repartition(16) // force merges
    for (k <- Seq(1, 3, 10))
      assert(viaAgg(df, k) == viaWindow(df, k), s"k=$k")
  }

  test("ties break by id ASC and order is deterministic") {
    val df = Seq((1L, 7L, 30L), (1L, 7L, 10L), (1L, 7L, 20L),
      (1L, 9L, 99L)).toDF("g", "s", "id").repartition(4)
    val got = viaAgg(df, 3).toSeq.sortBy(_._2)
    assert(got.map(r => (r._3, r._4)) == Seq((99L, 9L), (10L, 7L), (20L, 7L)))
  }

  test("fewer than k inputs returns them all; nulls are ignored") {
    val df = Seq((Some(1L), Some(5L), Some(1L)), (Some(1L), None, Some(2L)),
      (Some(1L), Some(3L), None))
      .toDF("g", "s", "id")
    val got = viaAgg(df, 10)
    assert(got == Set((1L, 1, 1L, 5L)))
  }

  test("buffer keeps at most k entries through adds and merges") {
    val b = new TopKBy.Buf(3)
    (1L to 100L).foreach(i => b.add(i, i))
    assert(b.entries.length == 3)
    assert(b.sorted.toSeq == Seq((100L, 100L), (99L, 99L), (98L, 98L)))
    val o = new TopKBy.Buf(3)
    Seq((200L, 1L), (150L, 2L), (1L, 3L)).foreach { case (s, i) => o.add(s, i) }
    b.mergeIn(o)
    assert(b.sorted.toSeq == Seq((200L, 1L), (150L, 2L), (100L, 100L)))
  }
}
