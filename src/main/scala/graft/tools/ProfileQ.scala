package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Empirical per-job decomposition of a registered query's wall time
  * (guide §1: measure where the time goes before touching anything).
  * Spark's default job description is the action call site, so a
  * listener that records (callsite, duration) per job attributes the
  * eager internal maintenance jobs (appends, syncs, folds) that a
  * lifecycle query runs while its DataFrame is being BUILT — the part
  * `explain` on the returned frame never shows.
  *
  * Usage: runMain graft.tools.ProfileQ <sfDir> <queryName> [...]
  * Prints, per query: total wall, then every job ≥ 50 ms as
  * (seconds, callsite), plus an aggregate by callsite.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQ <sfDir> <query> [query …]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val defs = graft.SparkEntry.allDefs.filter(d => names.contains(d.name))
    require(defs.map(_.name).toSet == names.toSet,
      s"unknown queries: ${names.diff(defs.map(_.name)).mkString(", ")}")
    graft.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long)]() // id -> (desc, t0)
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Double)]())
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          done.add((desc, (je.time - t0) / 1e3))
        }
      }
    }
    defs.foreach { d =>
      // warm pass (JIT, page cache) so the profiled pass matches the
      // bench's min-of-3 steady state
      try d.fn(spark, dir).count() catch { case _: Throwable => () }
      done.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try d.fn(spark, dir).count() catch { case t: Throwable =>
        println(s"FAILED ${d.name}: ${t.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain the last JobEnd
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val all = done.asScala.toSeq
      println(f"\n===== ${d.name}: wall=$wall%.2f s, " +
        f"jobs=${all.size}, job-sum=${all.map(_._2).sum}%.2f s =====")
      println("-- jobs >= 0.05 s, in order --")
      all.filter(_._2 >= 0.05).foreach { case (d0, s) =>
        println(f"  $s%6.2f  $d0") }
      println("-- aggregate by callsite --")
      all.groupBy(_._1).map { case (k, v) =>
        (v.map(_._2).sum, v.size, k) }.toSeq.sortBy(-_._1)
        .take(25).foreach { case (s, n, k) =>
          println(f"  $s%6.2f  n=$n%-4d $k") }
    }
    spark.stop()
  }
}
