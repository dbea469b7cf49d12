package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordering / horizon edge semantics of q188's funnel and q189's
  * cohorts that the sf-data oracle exercises only statistically:
  * out-of-order steps must not convert, the horizon cutoff is
  * inclusive, and a repeat event cannot resurrect a dead funnel.
  * Black-box through the real query over a synthetic events table. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1000000L
  private val day = 24L * 3600 * us

  /** Write a synthetic events.parquet and run q188 over it. */
  private def funnel(rows: Seq[(Long, Long, String)])
      : Map[Long, (Long, Long)] = {
    val dir = tmpDir("funnel")
    val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
    rows.zipWithIndex.map { case ((uid, tu, ty), i) =>
      // LocalDateTime → TIMESTAMP_NTZ, the canonical events.ts type
      (i.toLong, epoch.plusNanos(tu * 1000), uid, ty, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    EventsQ.q188(spark, dir)
      .select("step", "n_users", "conv_fp")
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, c) => s -> (n, c) }.toMap
  }

  test("steps out of order never convert; in order they do") {
    // u1: signup → view → purchase (converts fully)
    // u2: view BEFORE signup, purchase after — view must not count,
    //     so neither can the purchase (its gate is the view time)
    val r = funnel(Seq(
      (1L, 1 * us, "signup"), (1L, 2 * us, "view"),
      (1L, 3 * us, "purchase"),
      (2L, 1 * us, "view"), (2L, 2 * us, "signup"),
      (2L, 3 * us, "purchase")))
    assert(r(1L) == (2L, 1000000L)) // both signed up
    assert(r(2L) == (1L, 500000L))  // only u1 viewed post-signup
    assert(r(3L) == (1L, 1000000L)) // of viewers, all purchased
  }

  test("a view AT the signup instant counts (inclusive bound)") {
    val r = funnel(Seq(
      (1L, 5 * us, "signup"), (1L, 5 * us, "view"),
      (1L, 6 * us, "purchase")))
    assert(r(2L)._1 == 1L && r(3L)._1 == 1L)
  }

  test("the 3-day horizon from step 1 cuts late steps") {
    // u1 views 1µs past the horizon; u2 views exactly at it
    val r = funnel(Seq(
      (1L, 0L, "signup"), (1L, 3 * day + 1, "view"),
      (2L, 0L, "signup"), (2L, 3 * day, "view")))
    assert(r(2L) == (1L, 500000L),
      "horizon is inclusive; one tick past it is out")
  }

  test("a purchase gates on the EARLIEST qualifying view") {
    // view at t=2, purchase at t=3, second view at t=4: the purchase
    // must count (its gate is the first view), and a user whose only
    // purchase precedes every view must not
    val r = funnel(Seq(
      (1L, 1 * us, "signup"), (1L, 2 * us, "view"),
      (1L, 3 * us, "purchase"), (1L, 4 * us, "view"),
      (2L, 1 * us, "signup"), (2L, 2 * us, "purchase"),
      (2L, 3 * us, "view")))
    assert(r(3L)._1 == 1L)
  }

  test("event paths: first-5 journey strings in exact time order") {
    val dir = tmpDir("paths")
    val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
    // u1 and u2 share a 3-step journey; u3 diverges; u1 has a 6th
    // event that must fall outside the first-5 window
    val rows = Seq(
      (10L, Seq("signup", "view", "click", "view", "purchase", "error")),
      (11L, Seq("signup", "view", "click", "view", "purchase")),
      (12L, Seq("view", "signup")))
    rows.flatMap { case (uid, types) =>
      types.zipWithIndex.map { case (ty, i) =>
        (uid * 100 + i, epoch.plusSeconds(i.toLong), uid, ty, 0.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventsQ.q194(spark, dir)
      .select("path", "n_users").as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("signup>view>click>view>purchase", 2L),
      ("view>signup", 1L)))
  }

  test("rate anomaly: the integer test flags exactly the >3sigma hour") {
    val dir = tmpDir("anom")
    val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
    // 15 hours of 10 events + one 300-event hour: only the spike is
    // past 3 population sigmas (hand-check: (16*300-450)^2 = 18922500
    // > 9*(16*91500-450^2) = 11353500; a 10-count hour scores 84100)
    val rows = (0 until 16).flatMap { h =>
      val n = if (h == 7) 300 else 10
      (0 until n).map(i =>
        ((h * 1000 + i).toLong, epoch.plusHours(h.toLong).plusSeconds(
          i.toLong), 1L, "click", 0.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val got = EventsQ.q195(spark, dir)
      .select("event_type", "n_hours", "n_events", "n_anomalies",
        "min_hourly", "max_hourly")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got == (("click", 16L, 450L, 1L, 10L, 300L)))
  }

  test("retention cohorts: a user is active in their own week 0") {
    val dir = tmpDir("cohort")
    // two users first seen in week A, one returns two weeks later;
    // one user first seen in week B
    val base = java.time.LocalDate.of(2024, 1, 1) // a Monday
    def ts(d: Int) = base.plusDays(d.toLong).atStartOfDay()
    Seq((1L, ts(0), 10L, "view", 0.0, "{}"),
      (2L, ts(1), 11L, "view", 0.0, "{}"),
      (3L, ts(15), 10L, "click", 0.0, "{}"),
      (4L, ts(8), 12L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventsQ.q189(spark, dir)
      .select("cohort_week", "week_offset", "active_users",
        "retention_fp")
      .as[(java.sql.Date, Long, Long, Long)].collect().toSet
    val wkA = java.sql.Date.valueOf(base)
    val wkB = java.sql.Date.valueOf(base.plusDays(7))
    assert(got == Set(
      (wkA, 0L, 2L, 1000000L), // both week-A users active week 0
      (wkA, 2L, 1L, 500000L),  // one of two returned in week 2
      (wkB, 0L, 1L, 1000000L)))
  }

  private val epoch0 = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
  private def evDf(rows: Seq[(Long, Long, String)]) =
    rows.zipWithIndex.map { case ((uid, tu, ty), i) =>
      (i.toLong, epoch0.plusNanos(tu * 1000), uid, ty)
    }.toDF("event_id", "ts", "user_id", "event_type")

  test("funnelFold: seeded chain equals the batch chain across splits") {
    // a funnel spanning three micro-batches: signup in b1, view in
    // b2, purchase in b3 — plus a user whose view lands outside the
    // horizon, and a user fully inside one batch
    val rows = Seq(
      (1L, 0L, "signup"), (1L, day, "view"), (1L, 2 * day, "purchase"),
      (2L, 0L, "signup"), (2L, 4 * day, "view"), // past the horizon
      (3L, day, "signup"), (3L, day + us, "view"),
      (3L, day + 2 * us, "purchase"))
    val state = tmpDir("ffold_state")
    val ev = evDf(rows)
    // time-ordered split (per-user order preserved)
    EventsQ.funnelFold(ev.filter(expr(
      s"unix_micros(CAST(ts AS TIMESTAMP)) < $day")), state)
    EventsQ.funnelFold(ev.filter(expr(
      s"unix_micros(CAST(ts AS TIMESTAMP)) >= $day AND " +
        s"unix_micros(CAST(ts AS TIMESTAMP)) < ${2 * day}")), state)
    EventsQ.funnelFold(ev.filter(expr(
      s"unix_micros(CAST(ts AS TIMESTAMP)) >= ${2 * day}")), state)
    val got = EventsQ.funnelReport(spark, state)
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    // batch-global on the same events must agree
    val dir = tmpDir("ffold_batch")
    rows.zipWithIndex.map { case ((uid, tu, ty), i) =>
      (i.toLong, epoch0.plusNanos(tu * 1000), uid, ty, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val want = EventsQ.q188(spark, dir)
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    assert(got == want, s"streamed $got vs batch $want")
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
  }

  test("funnelStreamToTable: exactly-once across a checkpoint restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val state = tmpDir("fstream_state")
    val ckpt = tmpDir("fstream_ckpt")
    val mem = MemoryStream[(Long, Long, Long, String)]
    val stream = mem.toDF
      .toDF("event_id", "tu", "user_id", "event_type")
      .select(col("event_id"),
        expr("timestamp_micros(tu)").cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"))
    val q = EventsQ.funnelStreamToTable(stream, state, ckpt)
    try {
      mem.addData((1L, 0L, 7L, "signup"))
      q.processAllAvailable()
      mem.addData((2L, us, 7L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    // restart from the checkpoint, complete the funnel
    val q2 = EventsQ.funnelStreamToTable(stream, state, ckpt)
    try {
      mem.addData((3L, 2 * us, 7L, "purchase"),
        (4L, 3 * us, 8L, "signup"))
      q2.processAllAvailable()
    } finally q2.stop()
    val st = graft.sink.CdcTable.read(spark, state)
      .select("user_id", "f1", "f2", "f3")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(st(7L) == ((Some(0L), Some(us), Some(2 * us))),
      s"funnel completed across the restart: $st")
    assert(st(8L) == ((Some(3 * us), None, None)))
    val rep = EventsQ.funnelReport(spark, state)
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    assert(rep == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
