package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side phase profiler for the q59 capped-Jaccard path. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jac] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables(spark, dir, "documents")
    docs.count() // warm
    (1 to 2).foreach { p =>
      val staged = docs.select(col("doc_id").as("id"),
        col("source").as("blk"), expr("shingle_ids(text)").as("sids"))
      time(s"p$p staged count (shingle_ids only)") { staged.count() }
      time(s"p$p full q59 (materialize=true)") {
        graft.ext.Dedup.ngramJaccardPairsFromSids(staged,
          threshold = 0.3, maxShingleDocFreq = Some(25L)).count()
      }
      time(s"p$p full q59 (materialize=false)") {
        graft.ext.Dedup.ngramJaccardPairsFromSids(staged,
          threshold = 0.3, maxShingleDocFreq = Some(25L),
          materialize = false).count()
      }
    }
    spark.stop()
  }
}
