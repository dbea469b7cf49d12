package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: nearDupIncremental candidate cost vs plane count
  * (second arg; 0 or absent = the auto-derived width) and band count
  * (third arg, default 1). */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val planes = args.lift(1).map(_.toInt).getOrElse(0)
    val bands = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = graft.Tables(spark, dir, "embeddings")
    val cut = vecs.agg(max(col("vec_id"))).head().getLong(0) / 2
    val idx = graft.queries.QueryDef.scratchDir("vecprobe")
    val t0 = System.nanoTime()
    Similarity.nearDupIncremental(
      vecs.filter(col("vec_id") < cut), "vec_id", 0.45, idx,
      planes = planes)
    val n = Similarity.nearDupIncremental(
      vecs.filter(col("vec_id") >= cut), "vec_id", 0.45, idx,
      planes = planes, bands = bands).count()
    println(f"planes=$planes bands=$bands pairs=$n " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
