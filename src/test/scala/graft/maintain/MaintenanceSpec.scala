package graft.maintain

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compact reduces small files, preserves rows") {
    val dir = tmpDir("compact")
    val df = (1 to 1000).toDF("n")
    df.repartition(20).write.parquet(s"$dir/data")
    val statsBefore = Maintenance.tableStats(dir)
    assert(statsBefore.numFiles >= 20 && statsBefore.totalBytes > 0)
    val (before, after) = Maintenance.compact(spark, dir, targetFileMB = 128)
    assert(before >= 20 && after < before)
    assert(spark.read.parquet(s"$dir/data").count() == 1000)
    assert(Maintenance.tableStats(dir).numFiles < statsBefore.numFiles)
  }

  test("zorder rewrite preserves rows and clusters both columns") {
    val dir = tmpDir("zorder")
    val df = spark.range(0, 4096).toDF("a")
      .withColumn("b", ($"a" * 2654435761L) % 4096)
    df.repartition(8).write.parquet(s"$dir/data")
    Maintenance.zorderBy(spark, dir, Seq("a", "b"), numFiles = Some(16))
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() == 4096)
    assert(back.columns.sorted.toSeq == Seq("a", "b"))
    // clustering: per-file ranges of BOTH columns should be narrow —
    // each file's (max-min) span for column a far below the global span
    import org.apache.spark.sql.functions._
    val spans = back
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max($"a") - min($"a")).as("span_a"),
        (max($"b") - min($"b")).as("span_b"))
      .agg(avg($"span_a"), avg($"span_b")).collect()(0)
    assert(spans.getDouble(0) < 3000 && spans.getDouble(1) < 3000,
      s"z-order should bound per-file spans, got $spans")
  }

  test("compact preserves a Hive-partitioned layout") {
    val dir = tmpDir("compactpart")
    val df = (1 to 600).toDF("n")
      .withColumn("p", $"n" % 3)
    df.repartition(12).write.partitionBy("p").parquet(s"$dir/data")
    val (before, after) = Maintenance.compact(spark, dir, targetFileMB = 128)
    assert(after < before)
    // partition dirs survive the rewrite
    val children = graft.core.Fs.list(s"$dir/data")
      .filter(_.startsWith("p=")).sorted
    assert(children == Seq("p=0", "p=1", "p=2"), children.toString)
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() == 600)
    assert(back.filter($"p" === 1).count() == 200)
  }

  test("compact and zorder refuse to run on a CdcTable directory") {
    val dir = tmpDir("guard")
    // simulate a CdcTable layout: version pointer + sv=N generation
    (1 to 10).toDF("n").write.parquet(s"$dir/data/sv=1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_version"), "1".getBytes)
    intercept[IllegalArgumentException](Maintenance.compact(spark, dir))
    intercept[IllegalArgumentException](
      Maintenance.zorderBy(spark, dir, Seq("n")))
  }

  test("timestamp time travel resolves the newest version <= ts") {
    val dir = tmpDir("snapts")
    assert(Maintenance.writeSnapshot((1 to 3).toDF("n"), dir,
      tsMillis = Some(1000L)) == 0L)
    assert(Maintenance.writeSnapshot((1 to 5).toDF("n"), dir,
      tsMillis = Some(2000L)) == 1L)
    assert(Maintenance.writeSnapshot((1 to 7).toDF("n"), dir,
      tsMillis = Some(3000L)) == 2L)
    def at(ts: Long) = Maintenance.readSnapshot(spark, dir,
      timestampAsOf = Some(ts)).count()
    assert(at(1000L) == 3 && at(2500L) == 5 && at(3000L) == 7
      && at(9999L) == 7)
    intercept[IllegalArgumentException] {
      Maintenance.readSnapshot(spark, dir, timestampAsOf = Some(999L))
    }
    intercept[IllegalArgumentException] {
      Maintenance.readSnapshot(spark, dir, versionAsOf = Some(1L),
        timestampAsOf = Some(2000L))
    }
  }

  test("snapshot versions + time travel + vacuum") {
    val dir = tmpDir("snap")
    assert(Maintenance.writeSnapshot((1 to 3).toDF("n"), dir) == 0L)
    assert(Maintenance.writeSnapshot((1 to 5).toDF("n"), dir) == 1L)
    assert(Maintenance.writeSnapshot((1 to 7).toDF("n"), dir) == 2L)
    assert(Maintenance.readSnapshot(spark, dir).count() == 7)
    assert(Maintenance.readSnapshot(spark, dir, Some(0)).count() == 3)
    val dropped = Maintenance.vacuum(dir, keep = 2)
    assert(dropped == Seq(0L))
    assert(Maintenance.readSnapshot(spark, dir).count() == 7)
    assert(Maintenance.readSnapshot(spark, dir, Some(1)).count() == 5)
  }

  test("legacy _latest-pointer snapshot dirs are visible, not overwritten") {
    val dir = tmpDir("snaplegacy")
    // pre-_snaplog layout: v=N dirs committed via a _latest pointer
    (1 to 3).toDF("n").write.parquet(s"$dir/v=0")
    (1 to 5).toDF("n").write.parquet(s"$dir/v=1")
    graft.core.Fs.writeString(s"$dir/_latest", "1")
    assert(Maintenance.latestVersion(dir).contains(1L))
    assert(Maintenance.readSnapshot(spark, dir).count() == 5)
    assert(Maintenance.readSnapshot(spark, dir, Some(0)).count() == 3)
    // the next write APPENDS v=2 instead of recomputing v=0 and
    // silently overwriting the oldest legacy version
    assert(Maintenance.writeSnapshot((1 to 7).toDF("n"), dir) == 2L)
    assert(Maintenance.readSnapshot(spark, dir).count() == 7)
    assert(Maintenance.readSnapshot(spark, dir, Some(0)).count() == 3)
    // an UNCOMMITTED v=N dir (no _latest, no .snap) stays invisible
    val dir2 = tmpDir("snapinflight")
    (1 to 3).toDF("n").write.parquet(s"$dir2/v=0")
    assert(Maintenance.latestVersion(dir2).isEmpty)
  }
}
