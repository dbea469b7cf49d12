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
}
