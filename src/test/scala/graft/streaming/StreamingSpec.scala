package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics: memory-stream in, memory sink out (replacing
  * the reference's Testcontainers e2e per SURVEY.md §5). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregation over a memory stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "k", "v")
    val agg = StreamOps.tumbling(df, "ts", "10 minutes", "1 hour",
      Seq(count(lit(1)).as("n"), sum($"v").as("sv")), Seq($"k"))
    val q = agg.writeStream.format("memory").queryName("tumb")
      .outputMode("update").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:05:00"), "a", 2.0),
        (ts("2024-01-01 00:11:00"), "a", 4.0),
        (ts("2024-01-01 00:02:00"), "b", 8.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT k, n, sv FROM tumb ORDER BY k, n").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq == Seq(("a", 1L, 4.0), ("a", 2L, 3.0), ("b", 1L, 8.0)))
    } finally q.stop()
  }

  test("session windows close after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF.toDF("ts", "user")
    val sess = StreamOps.sessions(df, "ts", "30 minutes", "2 hours",
      Seq($"user"), Seq(count(lit(1)).as("n")))
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:00:00"), "u1"),
        (ts("2024-01-01 00:10:00"), "u1"),  // same session
        (ts("2024-01-01 01:00:00"), "u1"))  // gap > 30min → new session
      q.processAllAvailable()
      val n = spark.sql("SELECT COUNT(*) FROM sess").collect()(0).getLong(0)
      assert(n == 2, "two sessions for u1")
    } finally q.stop()
  }

  test("stream-stream interval join pairs within the time band only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String)]
    val buys = MemoryStream[(Timestamp, String)]
    val joined = StreamOps.intervalJoin(
      clicks.toDF.toDF("click_ts", "user"),
      buys.toDF.toDF("buy_ts", "user"),
      key = "user", leftTs = "click_ts", rightTs = "buy_ts",
      watermark = "1 hour", lower = "0 minutes", upper = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      clicks.addData(
        (ts("2024-01-01 10:00:00"), "u1"),
        (ts("2024-01-01 10:00:00"), "u2"))
      buys.addData(
        (ts("2024-01-01 10:10:00"), "u1"),  // within 30 min → joins
        (ts("2024-01-01 11:30:00"), "u2"),  // outside the band → no
        (ts("2024-01-01 09:50:00"), "u1"))  // before the click → no
      q.processAllAvailable()
      val rows = spark.sql("SELECT user, click_ts, buy_ts FROM ivj")
        .collect()
      assert(rows.length == 1)
      assert(rows(0).getString(0) == "u1" &&
        rows(0).getTimestamp(2) == ts("2024-01-01 10:10:00"))
    } finally q.stop()
  }

  test("interval join lower bound is an offset from the left time") {
    // batch frames — the plan is identical to the streaming one
    val clicks = Seq((ts("2024-01-01 10:00:00"), "u1"))
      .toDF("click_ts", "user")
    val buys = Seq(
      (ts("2024-01-01 10:05:00"), "u1"),  // before left+10min → no
      (ts("2024-01-01 10:15:00"), "u1"),  // inside [10, 30] → joins
      (ts("2024-01-01 09:55:00"), "u1"))  // before the click → no
      .toDF("buy_ts", "user")
    val fwd = StreamOps.intervalJoin(clicks, buys, "user",
      "click_ts", "buy_ts", "1 hour",
      lower = "10 minutes", upper = "30 minutes")
    assert(fwd.select("buy_ts").as[Timestamp].collect().toSeq ==
      Seq(ts("2024-01-01 10:15:00")))
    // a negative lower reaches BACKWARD from the left event
    val back = StreamOps.intervalJoin(clicks, buys, "user",
      "click_ts", "buy_ts", "1 hour",
      lower = "-10 minutes", upper = "0 minutes")
    assert(back.select("buy_ts").as[Timestamp].collect().toSeq ==
      Seq(ts("2024-01-01 09:55:00")))
  }

  test("streaming CDC ingest end-to-end via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val metrics = IngestMetrics.attach(spark)
    val mem = MemoryStream[String]
    val base = tmpDir("scdc")
    val cfg = CdcIngest.Config(base, checkpointDir = tmpDir("sckpt"),
      triggerMillis = 100L)
    val q = CdcIngest.start(mem.toDF.toDF("value"), cfg)
    val now = System.currentTimeMillis()
    def env(op: String, id: String, x: Int, ts: Long) =
      s"""{"payload":{"_id":"$id","before":null,"after":
         |"{\\"_id\\":\\"$id\\",\\"x\\":$x}","op":"$op","ts_ms":$ts,
         |"source":{"version":"2.5","connector":"mongodb","name":"m",
         |"ts_ms":$ts,"snapshot":"false","db":"sdb","rs":"rs0",
         |"collection":"items","ord":1}}}""".stripMargin.replace("\n", "")
    try {
      mem.addData(env("c", "i1", 1, now), env("c", "i2", 2, now))
      q.processAllAvailable()
      mem.addData(env("u", "i1", 9, now + 5000))
      q.processAllAvailable()
    } finally q.stop()
    val t = graft.sink.CdcTable.read(spark, s"$base/sdb_items")
    assert(t.count() == 3)
    val cur = graft.query.CurrentState(t)
    assert(cur.filter($"_id" === "i1").select("x").as[Long].collect()
      .toSeq == Seq(9L))
    // listener observed this query's micro-batches (A4 batch stats);
    // listener-bus delivery is async, so poll briefly
    val deadline = System.currentTimeMillis() + 5000
    while (metrics.totalRows(q.id) < 3 &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(metrics.totalRows(q.id) == 3)
    spark.streams.removeListener(metrics)
  }

  test("crash recovery: restart from checkpoint neither loses nor " +
    "duplicates (T2/S6; reference test_crash_recovery.py)") {
    val srcDir = tmpDir("crashsrc")
    val base = tmpDir("crashbase")
    val ckpt = tmpDir("crashckpt")
    val now = System.currentTimeMillis()
    def env(id: String, x: Int) =
      s"""{"payload":{"_id":"$id","before":null,"after":
         |"{\\"_id\\":\\"$id\\",\\"x\\":$x}","op":"c","ts_ms":$now,
         |"source":{"version":"2.5","connector":"mongodb","name":"m",
         |"ts_ms":$now,"snapshot":"false","db":"rdb","rs":"rs0",
         |"collection":"recov","ord":1}}}""".stripMargin.replace("\n", "")
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, name),
        lines.mkString("\n").getBytes("UTF-8"))

    val cfg = CdcIngest.Config(base, checkpointDir = ckpt,
      triggerMillis = 100L)
    def source = spark.readStream.format("text")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .load(srcDir)

    writeFile("a.json", Seq(env("r1", 1), env("r2", 2)))
    val q1 = CdcIngest.start(source, cfg)
    try q1.processAllAvailable() finally q1.stop()

    // "crash": new data arrives while stopped; restart from checkpoint
    writeFile("b.json", Seq(env("r3", 3)))
    val q2 = CdcIngest.start(source, cfg)
    try q2.processAllAvailable() finally q2.stop()

    val t = graft.sink.CdcTable.read(spark, s"$base/rdb_recov")
    val ids = t.select("_id").as[String].collect().sorted
    assert(ids.toSeq == Seq("r1", "r2", "r3"), "exactly-once across restart")
  }
}
