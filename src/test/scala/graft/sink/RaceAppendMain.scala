package graft.sink

import org.apache.spark.sql.SparkSession

/** Subprocess entry for [[CommitArbitrationSpec]]'s two-JVM race: a
  * SEPARATE writer process (own SparkSession, own CdcTable.tableLocks,
  * own FileSystem objects — nothing shared with the spec's JVM except
  * the table directory) that appends `nBatches` one-row batches and
  * exits 0. The spec launches two of these concurrently; commit
  * arbitration between them exercises only the on-disk protocol. */
object RaceAppendMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, writerId, nBatchesS, syncDir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import java.nio.file.{Files, Paths}
      import spark.implicits._
      // barrier: report ready, then wait for the spec's go signal so
      // both processes append in the same window (a sequential run
      // would not race the commit protocol at all)
      Files.write(Paths.get(syncDir, s"ready-$writerId"),
        Array.empty[Byte])
      val deadline = System.currentTimeMillis() + 60000L
      while (!Files.exists(Paths.get(syncDir, "go"))) {
        if (System.currentTimeMillis() > deadline)
          sys.error("race barrier never released")
        Thread.sleep(20L)
      }
      (1 to nBatchesS.toInt).foreach { i =>
        CdcTable.append(
          Seq((s"$writerId-$i", writerId)).toDF("payload", "writer"),
          dir)
      }
    } finally spark.stop()
  }
}
