package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DV commit-cost probe (r15 verdict #2's "Done" criterion): shows
  * that a scattered keyed delete's COMMIT cost is O(tombstones) —
  * flat as the table grows — under deletion vectors, while the
  * rewrite route's cost grows with the touched-file bytes (a
  * scattered key set touches every file, so the rewrite approaches a
  * full table rewrite). Run: `sbt "runMain graft.tools.DvProbe"`;
  * results recorded in ROUND16_NOTES. */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sink.CdcTable

    val k = 1000 // tombstones, FIXED across scales
    for (n <- Seq(100000L, 400000L, 1600000L)) {
      def mk(tag: String): String = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"dvprobe_${tag}_$n").toString
        // 32 files, ~200 B/row payload; keys scattered so the k
        // victims touch (almost) every file
        CdcTable.append(
          spark.range(n).select(col("id"),
            concat(lit("k"), col("id")).as("_id"),
            md5(col("id").cast("string")).as("p1"),
            md5((col("id") + 1).cast("string")).as("p2"),
            md5((col("id") + 2).cast("string")).as("p3"),
            md5((col("id") + 3).cast("string")).as("p4"),
            md5((col("id") + 4).cast("string")).as("p5"),
            md5((col("id") + 5).cast("string")).as("p6"))
            .repartition(32),
          dir, partitionBy = Nil)
        dir
      }
      val keys = spark.range(k)
        .select(concat(lit("k"), col("id") * (n / k)).as("_id"))
      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val dvDir = mk("dv")
      val (rd, td) = time(CdcTable.deleteKeysDV(spark, dvDir, keys,
        Seq("_id")))
      val rwDir = mk("rw")
      val (rr, tr) = time(CdcTable.deleteKeys(spark, rwDir, keys,
        Seq("_id")))
      println(f"n=$n%8d  dv: ${td}%6.2f s (deleted ${rd.rowsDeleted}, " +
        f"rewrote ${rd.filesRewritten})   rewrite: ${tr}%6.2f s " +
        f"(deleted ${rr.rowsDeleted}, rewrote ${rr.filesRewritten})")
    }
    spark.stop()
  }
}
