package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan (and optionally
  * times) for named queries. Usage:
  *   runMain graft.tools.Explain <sfDir> [time] <queryName>...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val time = args.contains("time")
    val names = args.drop(1).filterNot(_ == "time")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "ERROR"))
    val defs = SparkEntry.allDefs.filter(d =>
      names.isEmpty || names.contains(d.name))
    defs.foreach { d =>
      println(s"\n===== ${d.name} =====")
      val df = d.fn(spark, sfDir)
      df.explain("formatted")
      if (time) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
