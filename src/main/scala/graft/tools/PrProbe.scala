package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ext.Graph.pageRank]]'s iteration machinery
  * alone (q129's k-NN edge construction is the measured-elsewhere
  * brute/LSH family): a deterministic pseudo-random graph of `n`
  * nodes × `deg` out-edges each, 3 iterations, min-of-2 wall time.
  *
  *   runMain graft.tools.PrProbe [nNodes] [deg]
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val deg = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(n)
      .select(col("id").as("src"),
        explode(expr(s"sequence(0, ${deg - 1})")).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src") * lit(31) + col("j")), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val rows = graft.ext.Graph
        .pageRank(edges, "src", "dst", iters = 3).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    println(f"pageRank n=$n deg=$deg iters=3: " +
      f"${times.map(_._1).min}%8.1f s  nodes=${times.head._2}")
    spark.stop()
  }
}
