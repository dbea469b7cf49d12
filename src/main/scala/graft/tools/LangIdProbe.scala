package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposed lang-id probe: trains the char-trigram model ONCE
  * (pinned), then times the composed explode+join scorer against the
  * native single-projection scorer on the same corpus — isolating the
  * scoring stage the r11 verdict flagged (the in-query 15 s at 100×
  * turned out to be train-dominated; this separates the two).
  *
  *   runMain graft.tools.LangIdProbe [factor]
  */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = s"/tmp/graft-scale$factor"
    ScaleData.ensure(spark, "/root/testdata/sf0.1", out, factor)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    val model = graft.ext.TextAnalysis.charTrigramLangModel(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("train (pinned)") { model.count() }
    println(s"model rows: ${model.count()}, " +
      s"langs: ${model.select("lang").distinct().count()}")
    for (pass <- 1 to 2) {
      time(s"composed scoring #$pass") {
        graft.ext.TextAnalysis.langIdTrained(docs, "doc_id", model)
          .agg(sum(col("bits_fp")), count(lit(1))).collect()
      }
      time(s"native scoring   #$pass") {
        graft.ext.TextAnalysis
          .langIdTrainedNative(docs, "doc_id", model)
          .agg(sum(col("bits_fp")), count(lit(1))).collect()
      }
    }
    spark.stop()
  }
}
