package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the r10→r11 lexical-index maintenance question:
  * the incremental index grows one commit per micro-batch — how much
  * probe latency does `GRAFT COMPACT INDEX` buy back at scale?
  * Builds the index over a [[ScaleData]] corpus in many small batches
  * (the streaming arrival shape), times [[graft.ext.TextAnalysis
  * .probeLexicalTable]] (min of 3), folds, times again.
  *
  *   runMain graft.tools.LexProbe [factor] [batches]
  */
object LexProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft-scale$factor"
    val gen = ScaleData.ensure(spark, base, out, factor)
    val idx = java.nio.file.Files
      .createTempDirectory("lexprobe").toString
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val t0 = System.nanoTime()
    for (b <- 0 until batches)
      graft.ext.TextAnalysis.lexicalIndexAppend(
        docs.filter(col("doc_id") % batches === b), idx, "doc_id",
        txn = Some(("lexprobe", b.toLong)))
    val build = (System.nanoTime() - t0) / 1e9
    def probeSec(): (Double, Long) = (1 to 3).map { _ =>
      val t = System.nanoTime()
      val n = graft.ext.TextAnalysis
        .probeLexicalTable(spark, idx, "vector hash join merge", k = 10)
        .count()
      ((System.nanoTime() - t) / 1e9, n)
    }.minBy(_._1)
    def files(): Int = graft.sink.CdcTable
      .read(spark, s"$idx/postings").inputFiles.length
    val (pb, nb) = probeSec(); val fb = files()
    println(f"corpus ${factor}x (gen $gen%.1f s); $batches batches in " +
      f"$build%.1f s; BEFORE fold: probe $pb%.2f s rows=$nb files=$fb")
    val tc = System.nanoTime()
    spark.sql(s"GRAFT COMPACT INDEX '$idx'").collect()
    val fold = (System.nanoTime() - tc) / 1e9
    val (pa, na) = probeSec(); val fa = files()
    println(f"fold $fold%.1f s; AFTER fold: probe $pa%.2f s rows=$na " +
      f"files=$fa")
    require(na == nb, s"fold changed the result: $nb vs $na")
    spark.stop()
  }
}
