package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Scratch profiler for the q111 PQ-join stages (kept out of tests;
  * run by hand: `runMain graft.tools.PqProbe <sfDir>`). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, dir, "embeddings")
    val books = Similarity.pqCodebooksFromRows(
      emb, "vec_id", "embedding", m = 4, codes = 16)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  n=$n")
    }
    val qs = emb.filter(col("vec_id") >= 16 && col("vec_id") % 7 === 0)
    val cs = emb.filter(col("vec_id") >= 16 && col("vec_id") % 7 =!= 0)
    t("corpus encode")(cs.select(col("vec_id"),
      Similarity.pqEncodeLit(spark, "embedding", books).as("codes"))
      .agg(sum(element_at(col("codes"), 1))).head().getLong(0))
    t("query luts")(qs.select(col("vec_id"),
      Similarity.pqLutLit(spark, "embedding", books).as("luts"))
      .agg(sum(element_at(element_at(col("luts"), 1), 1))).head()
      .getLong(0))
    val q = broadcast(qs.select(col("vec_id").as("q_id"),
      Similarity.pqLutLit(spark, "embedding", books).as("luts")))
    val c = cs.select(col("vec_id").as("c_id"),
      Similarity.pqEncodeLit(spark, "embedding", books).as("codes"))
    t("pair count only")(c.crossJoin(q).count())
    t("adc sum FUSED stage")(c.crossJoin(q)
      .select(Similarity.pqAdcCols("codes", "luts", 4).as("s"))
      .agg(sum(col("s"))).head().getLong(0))
    val cc = c.localCheckpoint()
    t("adc sum CUT stage")(cc.crossJoin(q)
      .select(Similarity.pqAdcCols("codes", "luts", 4).as("s"))
      .agg(sum(col("s"))).head().getLong(0))
    t("full knnJoinPq")(Similarity.knnJoinPq(qs, cs,
      "vec_id", "vec_id", 5, books).count())
    val plan = c.crossJoin(q)
      .select(Similarity.pqAdcCols("codes", "luts", 4).as("s"))
      .queryExecution.executedPlan.toString
    println(plan.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}
