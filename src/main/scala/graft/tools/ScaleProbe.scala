package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off scale probe: run named registered queries against an
  * arbitrary [[ScaleData]] factor of the sf0.1 corpus and print
  * min-of-2 wall times — for scaling questions the 10× bench section
  * doesn't answer (e.g. r9 verdict #8: does the q59 df cap keep pair
  * expansion flat at 100×?).
  *
  *   runMain graft.tools.ScaleProbe [factor] [queryName...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val names: Set[String] =
      if (args.length > 1) args.drop(1).toSet
      else Set("q59_ngram_jaccard_capped")
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
    println(f"corpus: ${factor}x at $out (gen ${gen}%.1f s)")
    for (d <- graft.SparkEntry.allDefs if names(d.name)) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = d.fn(spark, out).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"${d.name}%-28s ${factor}x: " +
        f"${times.map(_._1).min}%8.1f s  rows=${times.head._2}")
    }
    spark.stop()
  }
}
