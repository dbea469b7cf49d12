package graft.ext

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 10:00:01"), "t3")
    ).toDF("k", "lts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:05"), 101.0), // same instant as t1 → wins
      (1L, ts("2024-01-01 10:00:09"), 102.0),
      (2L, ts("2024-01-01 10:00:02"), 50.0)   // after t3 → no match
    ).toDF("k", "rts", "price")
    val r = AsOfJoin(trades, quotes, "k", "lts", "rts")
      .select($"trade", $"_asof.price")
      .as[(String, Option[Double])].collect().toMap
    assert(r("t1").contains(101.0), "<= semantics: same-instant quote wins")
    assert(r("t2").contains(102.0))
    assert(r("t3").isEmpty, "no quote before t3")
  }

  test("as-of join keeps every left row and all left columns") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x", 42))
      .toDF("k", "lts", "a", "b")
    val right = Seq((9L, ts("2023-01-01 00:00:00"), 1.0))
      .toDF("k", "rts", "v")
    val out = AsOfJoin(left, right, "k", "lts", "rts")
    assert(out.columns.toSeq == Seq("k", "lts", "a", "b", "_asof"))
    assert(out.count() == 1 && out.filter($"_asof".isNull).count() == 1)
  }
}
