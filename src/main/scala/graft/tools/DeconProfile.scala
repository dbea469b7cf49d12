package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Decontaminate

/** Builder-side phase profiler for the q74 decontamination path. */
object DeconProfile {
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
      println(f"[decon] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables(spark, dir, "documents")
    docs.count() // warm
    (1 to 2).foreach { p =>
      val corpus = docs.filter(col("source") =!= "src0")
      val eval = docs.filter(col("source") === "src0")
      val evalSids = time(s"p$p eval sids distinct plan+collect") {
        Decontaminate.withNgramSids(eval, "text", 4)
          .select(explode(col("sids")).as("sid")).distinct()
          .as(org.apache.spark.sql.Encoders.scalaLong).collect()
      }
      println(s"[decon] eval distinct sids: ${evalSids.length}")
      val exploded = Decontaminate.withNgramSids(corpus, "text", 4)
        .select(col("doc_id").as("id"), explode(col("sids")).as("sid"))
      time(s"p$p corpus explode count (no bloom)") { exploded.count() }
      time(s"p$p full contaminated count") {
        Decontaminate.contaminated(corpus, eval, "text", "doc_id", n = 4)
          .count()
      }
    }
    spark.stop()
  }
}
