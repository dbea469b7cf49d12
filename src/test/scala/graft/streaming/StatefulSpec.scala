package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops exact duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val out = StreamOps.dedupeStream(mem.toDF.toDF("ts", "k"),
      "ts", "1 hour", Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData((t, "a"), (t, "a"), (t, "b"))
      q.processAllAvailable()
      // cross-batch duplicate with a RE-STAMPED event time: still the
      // same key within the watermark → dropped
      val t2 = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
      mem.addData((t2, "a"))
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM dedup")
        .collect()(0).getLong(0) == 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits each closed session exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val out = StreamOps.closedSessions(mem.toDF.toDF("k", "ts"),
      "k", "ts", gapMs = 60_000L, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // two bursts of key a separated by > gap INSIDE one batch: the
      // first session is held until the watermark passes end+gap and
      // is emitted by the no-data micro-batch that follows batch 1
      // (relies on spark.sql.streaming.noDataMicroBatches.enabled,
      // default true); the second session stays open
      mem.addData(("a", t("00:00:00")), ("a", t("00:00:30")),
        ("a", t("00:05:00")), ("b", t("00:05:10")))
      q.processAllAvailable()
      val afterB1 = spark.sql(
        "SELECT key, start_ms, end_ms, n_events FROM sess")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(afterB1 == Seq(
        ("a", t("00:00:00").getTime, t("00:00:30").getTime, 2L)),
        s"only the gap-closed session may emit: $afterB1")
      // advancing the watermark far past end+gap times the rest out
      mem.addData(("c", t("01:00:00")))
      q.processAllAvailable()
      mem.addData(("c", t("02:00:00"))) // extra batch: timeout fires
      q.processAllAvailable()
      val all = spark.sql(
        "SELECT key, n_events FROM sess ORDER BY key, n_events")
        .as[(String, Long)].collect().toSeq
      assert(all.contains(("a", 1L)) && all.contains(("b", 1L)),
        s"open sessions must close via event-time timeout: $all")
      assert(all.count(_._1 == "a") == 2, s"no double emission: $all")
    } finally q.stop()
  }

  test("transformWithState sessions: same once-only semantics, timers") {
    implicit val sqlCtx = spark.sqlContext
    // Spark 4 restricts transformWithState to the RocksDB provider;
    // scope it to this query and restore the session default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
      val out = StreamOps.closedSessionsTws(mem.toDF.toDF("k", "ts"),
        "k", "ts", gapMs = 60_000L, watermark = "0 seconds")
      val q = out.writeStream.format("memory").queryName("sess_tws")
        .outputMode("append").start()
      try {
        mem.addData(("a", t("00:00:00")), ("a", t("00:00:30")),
          ("a", t("00:05:00")), ("b", t("00:05:10")))
        q.processAllAvailable()
        val afterB1 = spark.sql(
          "SELECT key, start_ms, end_ms, n_events FROM sess_tws")
          .as[(String, Long, Long, Long)].collect().toSeq
        assert(afterB1 == Seq(
          ("a", t("00:00:00").getTime, t("00:00:30").getTime, 2L)),
          s"only the watermark-sealed session may emit: $afterB1")
        // advancing the watermark fires the event-time timers
        mem.addData(("c", t("01:00:00")))
        q.processAllAvailable()
        mem.addData(("c", t("02:00:00")))
        q.processAllAvailable()
        val all = spark.sql(
          "SELECT key, n_events FROM sess_tws ORDER BY key, n_events")
          .as[(String, Long)].collect().toSeq
        assert(all.contains(("a", 1L)) && all.contains(("b", 1L)),
          s"open sessions must close via timers: $all")
        assert(all.count(_._1 == "a") == 2, s"no double emission: $all")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState sessions survive a restart (state + timers)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val srcDir = tmpDir("twssrc")
    val outDir = tmpDir("twsout")
    val ckpt = tmpDir("twsckpt")
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def start() = {
      val src = spark.readStream.format("text")
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
        .load(srcDir)
        .selectExpr("split(value, ',')[0] AS k",
          "CAST(split(value, ',')[1] AS TIMESTAMP) AS ts")
      StreamOps.closedSessionsTws(src, "k", "ts",
          gapMs = 60_000L, watermark = "0 seconds")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    try {
      // batch 1: an open session for a, then c advances the watermark
      // far past a's gap → a seals via the timer before the stop
      writeFile("a.txt", Seq("a,2024-01-01 00:00:00",
        "a,2024-01-01 00:00:30", "c,2024-01-01 01:00:00"))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // restart: d advances the watermark past c's gap — c's session
      // (held in RocksDB state with its timer) must emit exactly once
      writeFile("b.txt", Seq("d,2024-01-01 02:00:00"))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val out = spark.read.parquet(outDir)
        .select("key", "n_events").as[(String, Long)]
        .collect().toSeq.sorted
      assert(out == Seq(("a", 2L), ("c", 1L)),
        s"state/timers must survive restart, once-only: $out")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("hll sketch estimates are close to exact distincts") {
    // q55 folds the estimator bound into boolean columns (so the
    // DuckDB oracle can hash-check them); assert they hold here too
    val r = graft.queries.WindowQ.q55(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getLong(1) > 0 && row.getLong(2) > 0,
        s"exact distincts must be positive: $row")
      assert(row.getBoolean(3), s"HLL estimate out of 5% bound: $row")
      assert(row.getBoolean(4), s"ACD estimate out of 5% bound: $row")
    }
  }

  test("mapGroupsWithState carries per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val out = StreamOps.runningPerKeyState(
      mem.toDF.toDF("k", "v"), "k", "v")
    val q = out.writeStream.format("memory").queryName("state")
      .outputMode("update").start()
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      mem.addData(("a", 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, events, sum FROM state ORDER BY key, events")
        .as[(String, Long, Double)].collect().toSeq
      // batch 1 emitted a→(2, 3.0), b→(1, 10.0); batch 2 a→(3, 7.0):
      // state carried the earlier count and sum forward
      assert(rows.contains(("a", 3L, 7.0)))
      assert(rows.contains(("b", 1L, 10.0)))
    } finally q.stop()
  }
}
