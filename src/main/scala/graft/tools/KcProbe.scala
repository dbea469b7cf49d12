package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What k regime does the distributed [[graft.ext.Similarity
  * .kCenterGreedy]] serve, and where does the driver-local
  * [[graft.ext.Similarity.kCenterGreedyLocal]] take over? Each
  * distributed round is one broadcast + one narrow max-dot scan + a
  * 1-row TakeOrdered — a full Spark job wave whose SCHEDULING cost is
  * corpus-independent, so rounds/sec saturates while the local FPS
  * loop (O(n·d) arithmetic per round, zero scheduling) scales only
  * with n·d. The probe measures rounds/sec for both at 1× and 100×
  * candidate volume (the r14 verdict #6 ask).
  */
object KcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = 64
    def mkEmb(n: Long) = spark.range(n)
      .select(col("id"), expr(
        s"""transform(sequence(1, $d), j -> CAST(
           |  (CAST(conv(substring(md5(concat(CAST(id AS STRING), ':',
           |    CAST(j AS STRING))), 1, 6), 16, 10) AS DOUBLE)
           |    / 16777216.0 - 0.5) AS FLOAT))""".stripMargin)
        .as("embedding"))
      .localCheckpoint()

    for (n <- Seq(2000L, 200000L)) {
      val emb = mkEmb(n)
      // distributed: time k=20 rounds (enough to amortize warmup)
      val k = 20
      val t0 = System.nanoTime()
      graft.ext.Similarity.kCenterGreedy(emb, "id", k, 0L).count()
      val distSec = (System.nanoTime() - t0) / 1e9
      // driver-local: k=1000 rounds over the same frame
      val kl = 1000
      val t1 = System.nanoTime()
      graft.ext.Similarity
        .kCenterGreedyLocal(emb, "id", kl, 0L).count()
      val locSec = (System.nanoTime() - t1) / 1e9
      println(f"[kcprobe] n=$n%d d=$d distributed: $k rounds in " +
        f"$distSec%.1f s = ${k / distSec}%.2f rounds/s | local: " +
        f"$kl rounds in $locSec%.1f s = ${kl / locSec}%.0f rounds/s " +
        f"(30k centers ~ ${30000 / (k / distSec) / 3600}%.1f h " +
        f"distributed vs ${30000 / (kl / locSec) / 60}%.1f min local)")
    }
    spark.stop()
  }
}
