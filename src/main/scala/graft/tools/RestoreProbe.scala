package graft.tools

import graft.sink.CdcTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is RESTORE really metadata-only — cost independent of table DATA
  * volume, bounded by manifest size? Compare [[CdcTable.restore]]
  * against the naive rollback (replaceWith(readAsOf(snapshot)), a
  * full data rewrite) on the same table.
  *
  * Shape: N commits × R rows each, then one destructive DELETE, then
  * the rollback both ways. At 100 TB the rewrite path is petabyte IO;
  * the metadata path stays a handful of manifest writes regardless —
  * the probe demonstrates the slope at local scale.
  */
object RestoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (rows <- Seq(10000L, 100000L, 1000000L)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"restoreprobe_$rows").toString
      val batches = 20
      val per = rows / batches
      (0 until batches).foreach { b =>
        CdcTable.append(
          spark.range(b * per, (b + 1) * per)
            .select(col("id"), (col("id") % 997).as("v"),
              concat(lit("row-"), col("id")).as("s")),
          dir, partitionBy = Nil)
      }
      val snap = CdcTable.log(dir).last.commit
      CdcTable.delete(spark, dir, "v < 500", partitionBy = Nil)

      val t0 = System.nanoTime()
      CdcTable.restore(spark, dir, commitAsOf = Some(snap))
      val tRestore = (System.nanoTime() - t0) / 1e9
      assert(CdcTable.read(spark, dir).count() == rows)

      // the naive rollback from the same post-delete state
      CdcTable.delete(spark, dir, "v < 500", partitionBy = Nil)
      val t1 = System.nanoTime()
      CdcTable.replaceWith(spark, dir,
        CdcTable.readAsOf(spark, dir, commitAsOf = Some(snap)),
        partitionBy = Nil)
      val tRewrite = (System.nanoTime() - t1) / 1e9
      assert(CdcTable.read(spark, dir).count() == rows)

      println(f"[restore-probe] rows=$rows%8d batches=$batches " +
        f"restore=$tRestore%6.2fs rewrite=$tRewrite%6.2fs " +
        f"ratio=${tRewrite / tRestore}%5.1fx")
    }
    spark.stop()
  }
}
