package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual registered queries against one data dir — the
  * focused sibling of [[graft.Bench]] for chasing a single row's
  * regression without paying a full bench pass. Usage:
  * `runMain graft.tools.QTime <sfDir> <queryName> [<queryName> …]`.
  * Same discipline as Bench: warm pass first, then min-of-3
  * interleaved timed passes with per-pass loadavg. */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QTime <sfDir> <query> [query …]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val defs = graft.SparkEntry.allDefs.filter(d => names.contains(d.name))
    require(defs.map(_.name).toSet == names.toSet,
      s"unknown queries: ${names.diff(defs.map(_.name)).mkString(", ")}")
    graft.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    defs.foreach(d => try d.fn(spark, dir).count()
      catch { case _: Throwable => () }) // warm
    def load(): Double =
      try java.nio.file.Files
        .readString(java.nio.file.Path.of("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val passes = (1 to 3).map { _ =>
      val l = load()
      defs.map { d =>
        val t0 = System.nanoTime()
        val sec =
          try { d.fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        (d.name, sec, l)
      }
    }
    defs.foreach { d =>
      val samples = passes.map(_.find(_._1 == d.name).get)
      val ok = samples.map(_._2).filter(_ >= 0)
      val best = if (ok.isEmpty) -1.0 else ok.min
      println(f"""{"query":"${d.name}","sec":$best%.3f,""" +
        s""""samples":[${samples.map(s => f"${s._2}%.3f").mkString(",")}],""" +
        s""""loadavg":[${samples.map(s => f"${s._3}%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
